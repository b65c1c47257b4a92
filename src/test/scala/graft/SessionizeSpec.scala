package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Sessionize

/** Batch sessionization: gap splitting, tie safety, and agreement with an
  * independent island-numbering formulation on real events. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions split on gaps strictly over the cap, 1-based per key") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")), // 10 min — same session
      (1L, ts("2024-01-01 10:40:00")), // exactly 30 min — NOT a break (strict >)
      (1L, ts("2024-01-01 11:40:00")), // 60 min — new session
      (2L, ts("2024-01-01 09:00:00")), // other key: independent numbering
      (2L, ts("2024-01-02 09:00:00"))
    ).toDF("user_id", "t")
    val got = Sessionize.sessions(ev, "user_id", "t", gapMinutes = 30)
      .orderBy($"user_id", $"session_seq")
      .select($"user_id", $"session_seq", $"n_events", $"duration_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 1L, 3L, 40L * 60 * 1000000),
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L),
      (2L, 2L, 1L, 0L)))
  }

  test("equal timestamps never split and count every row") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "t")
    val got = Sessionize.sessions(ev, "user_id", "t")
      .select($"session_seq", $"n_events").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 3L)))
  }

  test("sessions == independent island numbering on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"ts")
    val got = Sessionize.sessions(ev, "user_id", "ts", gapMinutes = 30)
    // independent formulation: number each event by COUNTING later-starting
    // sessions via a self-join on session starts (quadratic — test-only)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts")
    val starts = ev
      .withColumn("prev", lag($"ts", 1).over(w))
      .filter($"prev".isNull ||
        unix_micros($"ts") - unix_micros($"prev") > 30L * 60 * 1000000)
      .select($"user_id".as("s_user"), $"ts".as("s_ts"))
    val perTs = ev.groupBy($"user_id", $"ts").agg(count(lit(1)).as("cnt"))
    val naive = perTs.join(starts, $"user_id" === $"s_user" && $"s_ts" <= $"ts")
      .groupBy($"user_id", $"ts", $"cnt")
      .agg(countDistinct($"s_ts").as("session_seq"))
      .groupBy($"user_id", $"session_seq")
      .agg(sum($"cnt").as("n_events"), min($"ts").as("session_start"))
    val a = got.select($"user_id", $"session_seq", $"n_events", $"session_start")
      .collect().map(_.toSeq).toSet
    val b = naive.select($"user_id", $"session_seq", $"n_events", $"session_start")
      .collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}
