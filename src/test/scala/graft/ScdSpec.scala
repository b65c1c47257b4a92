package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val changes = Seq(
    // user 1: A, A (re-stated), B, A — four events, three runs
    (1L, ts("2024-01-01 00:00:00"), 10L, "A"),
    (1L, ts("2024-01-02 00:00:00"), 11L, "A"),
    (1L, ts("2024-01-03 00:00:00"), 12L, "B"),
    (1L, ts("2024-01-04 00:00:00"), 13L, "A"),
    // user 2: single event -> one current interval
    (2L, ts("2024-02-01 00:00:00"), 20L, "Z"))
    .toDF("user_id", "ts", "event_id", "state")

  test("same-state runs collapse; intervals close on the NEXT run's start") {
    val out = Scd.scd2(changes, "user_id", "ts", "state", "event_id")
      .orderBy($"user_id", $"valid_from")
      .select($"user_id", $"state", $"valid_from", $"valid_to", $"is_current")
      .collect()
    assert(out.length === 4)
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq === Seq("A", "B", "A"))
    // the re-stated A on Jan 2 did NOT open a new version: A runs to Jan 3
    assert(u1(0).getTimestamp(2) === ts("2024-01-01 00:00:00"))
    assert(u1(0).getTimestamp(3) === ts("2024-01-03 00:00:00"))
    assert(u1(1).getTimestamp(3) === ts("2024-01-04 00:00:00"))
    assert(u1(2).getTimestamp(3) === null && u1(2).getBoolean(4))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && u2.head.getBoolean(4))
  }

  test("NULL state transitions are real changes (null-safe compare)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Some("A")),
      (1L, ts("2024-01-02 00:00:00"), 2L, None),
      (1L, ts("2024-01-03 00:00:00"), 3L, None),
      (1L, ts("2024-01-04 00:00:00"), 4L, Some("A")))
      .toDF("user_id", "ts", "event_id", "state")
    val out = Scd.scd2(df, "user_id", "ts", "state", "event_id")
      .orderBy($"valid_from").select($"state").collect()
    assert(out.map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("A"), None, Some("A")))
  }

  test("equal timestamps break ties by tieCol deterministically") {
    val t0 = ts("2024-01-01 00:00:00")
    val df = Seq((1L, t0, 2L, "B"), (1L, t0, 1L, "A"))
      .toDF("user_id", "ts", "event_id", "state")
    val out = Scd.scd2(df, "user_id", "ts", "state", "event_id")
      .orderBy($"valid_from", $"state").select($"state", $"is_current").collect()
    // event_id 1 (A) precedes event_id 2 (B): B is the current state
    assert(out.map(r => (r.getString(0), r.getBoolean(1))).toSeq ===
      Seq(("A", false), ("B", true)))
  }

  test("snapshotDiff classifies insert/update/delete and drops unchanged") {
    val before = Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p3"))
      .toDF("id", "a", "b")
    val after = Seq((1L, "x", "p1"), (2L, "y2", "p2"), (4L, "w", "p4"))
      .toDF("id", "a", "b")
    val out = Scd.snapshotDiff(before, after, "id", Seq("a", "b"))
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out.toSeq === Seq(
      (2L, "update", Some("y2")),
      (3L, "delete", None),
      (4L, "insert", Some("w"))))
  }
}
