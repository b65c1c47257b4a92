package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Joins
import graft.plans.{AsofJoinExec, NativeAsof}

/** The native sort-merge as-of operator must (a) match the DataFrame
  * rewrite row-for-row, (b) plan exactly one AsofJoin node fed by
  * exchange+sort on each side, (c) handle the semantic edges the merge
  * loop is responsible for: no-match keys, null keys/times, inclusive
  * ties, and key changes mid-partition. */
class NativeAsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches ops/Joins.asofJoin on the events corpus") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("value"))
    val expected = Joins.asofJoin(views, purchases, "user_id", "ts", Seq("value"))
      .select($"event_id", $"asof_value").orderBy($"event_id").collect().toSeq
    val got = NativeAsof.asofJoin(views, purchases, "user_id", "ts", Seq("value"))
      .select($"event_id", $"asof_value").orderBy($"event_id").collect().toSeq
    assert(got.nonEmpty && got === expected)
  }

  test("plans one AsofJoinExec with clustered+sorted children") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("k", "t")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    val df = NativeAsof.asofJoin(l, r, "k", "t", Seq("v"))
    df.collect() // finalize the adaptive plan before inspecting it
    // descend through AQE wrappers/stages, which plain collect treats as leaves
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findAsofs(p: SparkPlan): Seq[AsofJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => findAsofs(a.executedPlan)
      case q: QueryStageExec => findAsofs(q.plan)
      case a: AsofJoinExec => a +: a.children.flatMap(findAsofs)
      case other => other.children.flatMap(findAsofs)
    }
    val asofs = findAsofs(df.queryExecution.executedPlan)
    assert(asofs.length === 1)
    // each side must arrive sorted by (key, time) — EnsureRequirements
    // satisfied the declared ordering requirement
    asofs.head.children.foreach { child =>
      assert(child.outputOrdering.length >= 2,
        s"child not sorted: ${child.outputOrdering}")
    }
  }

  test("merge edges: inclusive tie, backward pick-latest, no-match nulls") {
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), "tie"),      // == right @10:00 -> 20.0
      (1L, ts("2024-01-01 11:00:00"), "between"),  // latest ≤ 11:00 -> 20.0
      (1L, ts("2024-01-01 09:00:00"), "before"),   // before all -> null
      (2L, ts("2024-01-01 12:00:00"), "nokey"),    // key with no rights
      (3L, ts("2024-01-01 12:00:00"), "k3"))       // later key matches its own
      .toDF("k", "t", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 20.0),
      (3L, ts("2024-01-01 11:00:00"), 30.0))
      .toDF("k", "t", "v")
    val out = NativeAsof.asofJoin(l, r, "k", "t", Seq("v"))
      .select($"tag", $"asof_v").collect()
      .map(row => row.getString(0) ->
        (if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toMap
    assert(out === Map(
      "tie" -> Some(20.0), "between" -> Some(20.0), "before" -> None,
      "nokey" -> None, "k3" -> Some(30.0)))
  }

  test("forward direction picks the EARLIEST right ≥ t, inclusive") {
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), "tie"),     // == right @10:00 -> 20.0
      (1L, ts("2024-01-01 09:45:00"), "between"), // earliest ≥ -> 20.0
      (1L, ts("2024-01-01 11:00:00"), "after"),   // after all -> null
      (2L, ts("2024-01-01 12:00:00"), "nokey"))
      .toDF("k", "t", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 20.0))
      .toDF("k", "t", "v")
    val out = NativeAsof.asofJoinForward(l, r, "k", "t", Seq("v"))
      .select($"tag", $"asof_v").collect()
      .map(row => row.getString(0) ->
        (if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toMap
    assert(out === Map(
      "tie" -> Some(20.0), "between" -> Some(20.0), "after" -> None,
      "nokey" -> None))
  }

  test("tolerance: out-of-bound nearest match nulls out, in-bound passes") {
    val l = Seq(
      (1L, ts("2024-01-01 10:30:00"), "inbound"),   // 30 min after -> match
      (1L, ts("2024-01-01 12:30:00"), "stale"),     // 2.5 h after -> null
      (1L, ts("2024-01-01 10:00:00"), "exact"))     // 0 diff -> match
      .toDF("k", "t", "tag")
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 5.0)).toDF("k", "t", "v")
    val out = NativeAsof.asofJoinTolerance(l, r, "k", "t", Seq("v"),
        toleranceUs = 3600L * 1000000L)
      .select($"tag", $"asof_v").collect()
      .map(row => row.getString(0) ->
        (if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toMap
    assert(out === Map(
      "inbound" -> Some(5.0), "stale" -> None, "exact" -> Some(5.0)))
  }

  test("nearest picks the closer side; equidistant tie pins backward") {
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), "back_closer"),  // 9:45(15m) vs 11:00(60m)
      (1L, ts("2024-01-01 10:50:00"), "fwd_closer"),   // 9:45(65m) vs 11:00(10m)
      (1L, ts("2024-01-01 10:22:30"), "equidistant"),  // 37.5m both -> backward
      (1L, ts("2024-01-01 09:00:00"), "only_fwd"),     // before all -> 9:45
      (1L, ts("2024-01-01 12:00:00"), "only_back"),    // after all -> 11:00
      (2L, ts("2024-01-01 12:00:00"), "nokey"))
      .toDF("k", "t", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 09:45:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0))
      .toDF("k", "t", "v")
    val out = NativeAsof.asofJoinNearest(l, r, "k", "t", Seq("v"))
      .select($"tag", $"asof_v").collect()
      .map(row => row.getString(0) ->
        (if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toMap
    assert(out === Map(
      "back_closer" -> Some(1.0), "fwd_closer" -> Some(2.0),
      "equidistant" -> Some(1.0), "only_fwd" -> Some(1.0),
      "only_back" -> Some(2.0), "nokey" -> None))
  }

  test("nearest with tolerance: each side independently bounded") {
    val l = Seq(
      (1L, ts("2024-01-01 10:40:00"), "fwd_in"),   // back 55m out, fwd 20m in
      (1L, ts("2024-01-01 10:20:00"), "back_in"),  // back 35m in, fwd 40m out
      (1L, ts("2024-01-01 13:00:00"), "both_out"))
      .toDF("k", "t", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 09:45:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0))
      .toDF("k", "t", "v")
    val out = NativeAsof.asofJoinNearest(l, r, "k", "t", Seq("v"),
        toleranceUs = Some(2100L * 1000000L)) // 35 min
      .select($"tag", $"asof_v").collect()
      .map(row => row.getString(0) ->
        (if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toMap
    assert(out === Map(
      "fwd_in" -> Some(2.0), "back_in" -> Some(1.0), "both_out" -> None))
  }

  test("nearest matches a window-built oracle on the events corpus") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"value").as("value"))
    val got = NativeAsof.asofJoinNearest(clicks, views, "user_id", "ts",
        Seq("value"))
      .select($"event_id", $"asof_value").orderBy($"event_id").collect().toSeq
    // oracle: min |Δt|, tie -> earlier right row, via a plain ranked join
    val joined = clicks.join(views.withColumnRenamed("ts", "rts"), Seq("user_id"))
      .withColumn("dist", abs(unix_micros($"ts") - unix_micros($"rts")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_id").orderBy($"dist", $"rts")
    val best = joined.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"event_id", $"value".as("asof_value"))
    val expected = clicks.join(best, Seq("event_id"), "left")
      .select($"event_id", $"asof_value").orderBy($"event_id").collect().toSeq
    assert(got.nonEmpty && got === expected)
  }

  test("string keys survive sorter buffer reuse (buffered key copied)") {
    // many right rows per partition: the sort iterator reuses its UnsafeRow,
    // so a buffered UTF8String key eval'd from the CONSUMED row (not the
    // copy) would mutate as the merge advances — this locks the fix
    val l = (1 to 200).map(i => (f"k$i%03d", ts("2024-01-01 12:00:00"), i))
      .toDF("k", "t", "tag")
    val r = (1 to 200).map(i => (f"k$i%03d", ts("2024-01-01 10:00:00"), i.toDouble))
      .toDF("k", "t", "v")
    val out = NativeAsof.asofJoin(l, r, "k", "t", Seq("v"))
      .select($"tag", $"asof_v").collect()
    assert(out.length === 200)
    out.foreach { row =>
      assert(!row.isNullAt(1) && row.getDouble(1) === row.getInt(0).toDouble,
        s"tag ${row.getInt(0)} matched ${row.get(1)}")
    }
  }

  test("null keys and times never match but left rows survive") {
    val l = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), "ok"),
      (None, Some(ts("2024-01-01 10:00:00")), "nullkey"),
      (Some(1L), None, "nulltime"))
      .toDF("k", "t", "tag")
    val r = Seq(
      (Some(1L), Some(ts("2024-01-01 09:00:00")), 1.0),
      (None, Some(ts("2024-01-01 08:00:00")), 99.0),
      (Some(1L), None, 98.0))
      .toDF("k", "t", "v")
    val out = NativeAsof.asofJoin(l, r, "k", "t", Seq("v"))
      .select($"tag", $"asof_v").collect()
      .map(row => row.getString(0) ->
        (if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toMap
    assert(out === Map(
      "ok" -> Some(1.0), "nullkey" -> None, "nulltime" -> None))
  }
}
