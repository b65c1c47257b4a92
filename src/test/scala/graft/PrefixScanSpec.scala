package graft

import org.apache.spark.sql.functions._

import graft.ops.PrefixScan

/** The two-phase distributed running max (q160's watermark engine):
  * exact parity with the naive single-reducer window on random data
  * across many partitions, and the exclusive-scan edge (global first row
  * sees null). */
class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  test("exclusiveRunningMax ≡ naive global window on random data") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 500L).map(i => (i, rnd.nextLong() % 1000L))
    val df = rows.toDF("k", "v").repartition(7) // scrambled input
    val got = PrefixScan.exclusiveRunningMax(df, col("v"), "m", col("k"))
      .select("k", "m").as[(Long, Option[Long])].collect().toMap
    var best = Option.empty[Long]
    rows.sortBy(_._1).foreach { case (k, v) =>
      assert(got(k) === best, s"row $k")
      best = Some(best.fold(v)(math.max(_, v)))
    }
  }

  test("global first row has no predecessor: null") {
    val df = Seq((1L, 10L), (2L, 5L), (3L, 20L)).toDF("k", "v")
    val got = PrefixScan.exclusiveRunningMax(df, col("v"), "m", col("k"))
      .orderBy("k").select("m").collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getLong(0) === 10L)
    assert(got(2).getLong(0) === 10L)
  }

  test("descending values: the max sticks at the first row's value") {
    val df = (1L to 50L).map(i => (i, 100L - i)).toDF("k", "v")
    val got = PrefixScan.exclusiveRunningMax(df, col("v"), "m", col("k"))
      .filter(col("k") > 1L).select("m").as[Long].collect()
    assert(got.forall(_ === 99L))
  }
}
