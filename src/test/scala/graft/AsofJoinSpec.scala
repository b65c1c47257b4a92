package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Joins

/** asofJoin: union + one window pass must equal the naive inequality-join
  * formulation (greatest right.time ≤ left.time per key), including the
  * tie and no-match edges. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest at-or-before payload, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 10L, ts("2024-01-01 09:00:00")), // before any right row
      (4L, 20L, ts("2024-01-01 10:30:00")),
      (5L, 30L, ts("2024-01-01 10:30:00"))  // key with no right rows
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0), // exact tie with event 1 → taken
      (10L, ts("2024-01-01 11:00:00"), 2.0),
      (10L, ts("2024-01-01 11:00:00"), 5.0), // same (k,t): lexicographic max wins
      (20L, ts("2024-01-01 10:00:00"), 7.0)
    ).toDF("k", "t", "v")
    val got = Joins.asofJoin(left, right, "k", "t", Seq("v"))
      .orderBy($"event_id")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("asof_v")))
      .toMap
    assert(got(1L) === Some(1.0)) // inclusive tie
    assert(got(2L) === Some(5.0)) // latest, max-payload tiebreak
    assert(got(3L) === None)
    assert(got(4L) === Some(7.0))
    assert(got(5L) === None)
  }

  test("asofJoin == naive inequality-join formulation on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val fast = Joins.asofJoin(views, purchases, "user_id", "ts", Seq("value"))
      .select($"event_id", $"asof_value")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    // naive: range join + per-left argmax — the plan shape asofJoin avoids
    val dedup = purchases.groupBy($"user_id", $"ts")
      .agg(max($"value").as("value"))
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value")
    val naive = views
      .join(dedup, $"user_id" === $"p_user" && $"p_ts" <= $"ts", "left")
      .groupBy($"event_id")
      .agg(max_by($"value", $"p_ts").as("asof_value"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    assert(fast === naive)
    assert(fast.values.exists(_.nonEmpty) && fast.values.exists(_.isEmpty))
  }

  test("asofJoinForward picks the EARLIEST at-or-after payload (incl. ties, no-match)") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // exact tie with a right row
      (2L, 10L, ts("2024-01-01 10:30:00")), // between rights -> 11:00 one
      (3L, 10L, ts("2024-01-01 12:00:00")), // after all rights -> null
      (4L, 20L, ts("2024-01-01 10:30:00"))  // key with no right rows
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0),
      (10L, ts("2024-01-01 11:00:00"), 2.0),
      (10L, ts("2024-01-01 11:00:00"), 5.0) // same (k,t): lexicographic max
    ).toDF("k", "t", "v")
    val out = Joins.asofJoinForward(left, right, "k", "t", Seq("v"))
      .orderBy("event_id")
      .collect().map(r => Option(r.getAs[Any]("asof_v")))
    assert(out.toSeq === Seq(Some(1.0), Some(5.0), None, None))
  }

  test("asofJoinForward == naive inequality-join formulation on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val fast = Joins.asofJoinForward(views, purchases, "user_id", "ts", Seq("value"))
      .select($"event_id", $"asof_value")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    val dedup = purchases.groupBy($"user_id", $"ts")
      .agg(max($"value").as("value"))
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value")
    val naive = views
      .join(dedup, $"user_id" === $"p_user" && $"p_ts" >= $"ts", "left")
      .groupBy($"event_id")
      .agg(min_by($"value", $"p_ts").as("asof_value"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    assert(fast === naive)
    assert(fast.values.exists(_.nonEmpty) && fast.values.exists(_.isEmpty))
  }

  // --- hot-key-bounded variant --------------------------------------------

  test("asofJoinBucketed equals asofJoin on the tie/no-match edge cases") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-03 12:00:00")), // carry across a bucket gap
      (3L, 10L, ts("2024-01-01 09:00:00")),
      (4L, 20L, ts("2024-01-02 00:00:00")), // exactly on a bucket edge
      (5L, 30L, ts("2024-01-01 10:30:00"))
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0),
      (10L, ts("2024-01-01 11:00:00"), 2.0),
      (10L, ts("2024-01-01 11:00:00"), 5.0),
      (20L, ts("2024-01-01 10:00:00"), 7.0)
    ).toDF("k", "t", "v")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"event_id").collect()
        .map(r => r.getLong(0) -> Option(r.getAs[Any]("asof_v"))).toMap
    val base = asMap(Joins.asofJoin(left, right, "k", "t", Seq("v")))
    val bucketed = asMap(Joins.asofJoinBucketed(left, right, "k", "t", Seq("v")))
    assert(bucketed === base)
    assert(base(2L) === Some(5.0), "gap-spanning carry must survive")
    assert(base(4L) === Some(7.0), "bucket-edge row must see the prior bucket")
  }

  test("asofJoinBucketed == asofJoin on real events incl. a 90%-hot key") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // skew: ~90% of rows remapped onto one user id
    val skew = when(pmod($"event_id", lit(10)) < 9, lit(424242L))
      .otherwise($"user_id")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", skew.as("user_id"), $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select(skew.as("user_id"), $"ts", $"value")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"asof_value").collect()
        .map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    val base = asMap(Joins.asofJoin(views, purchases, "user_id", "ts",
      Seq("value")))
    val bucketed = asMap(Joins.asofJoinBucketed(views, purchases, "user_id",
      "ts", Seq("value")))
    assert(bucketed === base)
    assert(bucketed.values.exists(_.nonEmpty) &&
      bucketed.values.exists(_.isEmpty))
    // the hot key genuinely spans buckets: phase-1 partitions are
    // (key, day), so no single window partition held all its rows
    val hotDays = views.filter($"user_id" === 424242L)
      .select(date_trunc("day", $"ts")).distinct().count()
    assert(hotDays > 1, "hot key fits one bucket — test not exercising carry")
  }
}
