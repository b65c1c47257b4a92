package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Joins

/** intervalJoin: the bucketed equi-join must equal the naive inequality
  * join (start ≤ t < end) on handcrafted edges and seeded random data, and
  * must not plan a nested-loop join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("containment edges: inclusive start, exclusive end, multi-bucket span") {
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start → in
      (2L, ts("2024-01-01 11:00:00")), // == end → out
      (3L, ts("2024-01-01 10:59:59")), // just inside
      (4L, ts("2024-01-02 03:30:00")), // inside a 2-day interval, far bucket
      (5L, ts("2024-01-05 00:00:00"))  // matches nothing
    ).toDF("id", "t")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (200L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
    ).toDF("iid", "s", "e")
    val got = Joins.intervalJoin(probes, "t", intervals, "s", "e",
        bucketMicros = 3600L * 1000000L)
      .select($"id", $"iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 100L), (3L, 100L),
      (1L, 200L), (2L, 200L), (3L, 200L), (4L, 200L)))
  }

  test("intervalJoin == naive inequality join on seeded random data") {
    val rnd = new scala.util.Random(7)
    val probes = (0 until 400).map { i =>
      (i.toLong, new Timestamp(1704067200000L + rnd.nextInt(86400 * 3) * 1000L))
    }.toDF("id", "t")
    val intervals = (0 until 120).map { i =>
      val s = 1704067200000L + rnd.nextInt(86400 * 3) * 1000L
      (i.toLong, new Timestamp(s), new Timestamp(s + (rnd.nextInt(7200) + 1) * 1000L))
    }.toDF("iid", "s", "e")
    def pairs(df: DataFrame) =
      df.select($"id", $"iid").as[(Long, Long)].collect().toSet
    val fast = pairs(Joins.intervalJoin(probes, "t", intervals, "s", "e",
      bucketMicros = 1800L * 1000000L))
    val naive = pairs(probes.join(intervals, $"t" >= $"s" && $"t" < $"e"))
    assert(fast === naive)
    assert(fast.nonEmpty, "seeded data produced no matches — test is vacuous")
  }

  test("plan is an equi-join on the bucket, not a nested loop") {
    val probes = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("id", "t")
    val intervals = Seq((1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iid", "s", "e")
    val plan = Joins.intervalJoin(probes, "t", intervals, "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"intervalJoin planned a nested loop:\n$plan")
  }
}
