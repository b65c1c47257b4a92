package graft

import org.apache.spark.sql.functions.col

/** Physical-plan hygiene over the whole registered query surface: the
  * plan-shape properties the 100 TB story rests on, asserted rather than
  * eyeballed. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no registered query plans an unbroadcast cartesian product") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      // BroadcastNestedLoopJoin over a bounded dim (q32's disjunctive list
      // join, NOT-IN) is the documented exception; a shuffled cartesian is
      // never acceptable
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${plan.take(2000)}")
      spark.catalog.clearCache()
    }
  }

  test("q93 CUBE plans exactly one Expand pass") {
    val plan = queries.WarehouseQueries.q93CubeAgg(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).length === 1, plan.take(1500))
  }

  test("scd2's run-detect and interval-close windows share ONE sort") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val plan = ops.Scd.scd2(ev, "user_id", "ts", "event_type", "event_id")
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).length === 2, plan.take(1500))
    assert("Sort \\[".r.findAllIn(plan).length === 1, plan.take(1500))
  }

  test("q95's single user_id partitioning feeds both aggregate and window") {
    val plan = queries.WarehouseQueries.q95RangeWindow(spark, dir)
      .queryExecution.executedPlan.toString
    // spread + the declared repartition + the final ORDER BY range
    // exchange — the agg and the window add NO exchange of their own
    assert("Exchange".r.findAllIn(plan).length <= 3, plan.take(2000))
    assert("Window".r.findAllIn(plan).length === 1, plan.take(1500))
  }

  test("q150's zoned scan plans ONLY the zones the filter can touch") {
    // the ZonedScan.description reports survivors/total; AQE hides the
    // BatchScanExec node from a pre-execution collect, but the explain
    // text carries the scan description either way
    val q = queries.MonitorQueries.q150ZonedScan(spark, dir)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExtendedMode)
    // n_chars 47..558 → 9 zones of 64; the [256, 320] band overlaps 2
    assert(plan.contains("zones=2/9"), plan.take(2000))
  }

  test("q154's centroid join and q159's model join broadcast the small side") {
    val p154 = queries.MonitorQueries.q154LloydStep(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p154.contains("BroadcastNestedLoopJoin"), p154.take(1500))
    val p159 = queries.MonitorQueries.q159LmScore(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p159.contains("BroadcastHashJoin"), p159.take(1500))
    assert(!p159.contains("SortMergeJoin"), p159.take(1500))
  }

  test("the CEP matcher plans exactly one exchange — the key shuffle") {
    // a plain in-memory frame isolates the operator's own shape from
    // the parquet source's under-split spread exchange
    val ev = spark.range(100)
      .select(col("id").as("user_id"), (col("id") * 7).as("ts_us"),
        col("id").as("event_id"),
        org.apache.spark.sql.functions.lit("view").as("event_type"))
    val plan = ops.Cep.funnelMatches(ev, "user_id", col("ts_us"),
        col("event_id"), col("event_type"), "view", "click", "purchase",
        1800000000L)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length === 1, plan.take(1500))
    assert(plan.contains("hashpartitioning(k"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("q171's decile rank takes the two-phase range path, never a" +
    " single-reducer sort") {
    val plan = queries.SequenceQueries.q171DecileLift(spark, dir)
      .queryExecution.executedPlan.toString
    // the distributed index: range repartition on the order key …
    assert(plan.contains("rangepartitioning(n_events"), plan.take(2000))
    // … and the only single-partition funnels are 1-row aggregates
    // (totals / driver-side offset counts), never the user table
    assert("Exchange SinglePartition".r.findAllIn(plan).length <= 2,
      plan.take(2000))
    spark.catalog.clearCache()
  }

  test("q167's totals combine through a broadcast, not a cartesian") {
    val plan = queries.SequenceQueries.q167AbTest(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("q175's MCV rank plans a WindowGroupLimit, q178's codebook joins broadcast") {
    val p175 = queries.StatsQueries.q175ColumnStats(spark, dir)
      .queryExecution.executedPlan.toString
    // only topK+ties rows per column survive the rank exchange
    assert(p175.contains("WindowGroupLimit"), p175.take(2000))
    val p178 = queries.StatsQueries.q178PqAdc(spark, dir)
      .queryExecution.executedPlan.toString
    // both the encode join (M·K codebook) and the ADC lookup broadcast;
    // the table side never shuffles for a join
    assert(p178.contains("BroadcastHashJoin"), p178.take(2000))
    assert(!p178.contains("SortMergeJoin"), p178.take(2000))
  }

  test("q180's prefix windows partition by feature — no global window") {
    val p180 = queries.StatsQueries.q180MultiSplit(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p180.contains("windowspecdefinition(feature"), p180.take(2000))
    assert(!p180.contains("windowspecdefinition(v#"), p180.take(2000))
    // ONE stacked pass: totals come from the same window partition, so no
    // totals join and no second explode of the table exist
    assert("Generate explode".r.findAllIn(p180).length === 1, p180.take(2000))
    assert(!p180.contains("Join"), p180.take(2000))
  }

  test("q183's joins broadcast; q184/q186 plan exactly one table aggregate") {
    val p183 = queries.StatsQueries.q183IvfPqResidual(spark, dir)
      .queryExecution.executedPlan.toString
    // centroid/probed/codebook/qdist sides are all metadata-sized
    assert(p183.contains("BroadcastHashJoin"), p183.take(2000))
    assert(!p183.contains("SortMergeJoin"), p183.take(2000))
    spark.catalog.clearCache()
    // the apportionment and the advisor each reduce the table ONCE; all
    // later arithmetic runs on the strata/key-count rows
    val p184 = queries.StatsQueries.q184SeatAllocation(spark, dir)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p184).length <= 6, p184.take(2000))
    assert(!p184.contains("SortMergeJoin") &&
      !p184.contains("CartesianProduct"), p184.take(2000))
    val p186 = queries.StatsQueries.q186SkewAdvisor(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p186.contains("SortMergeJoin") &&
      !p186.contains("CartesianProduct"), p186.take(2000))
    spark.catalog.clearCache()
  }

  test("q185's exact cardinality joins key-COUNT tables, not rows") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val df = queries.StatsQueries.q185CardAudit(spark, dir)
    df.collect() // finalize the adaptive plan
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case other => other
    }
    def hasAgg(p: SparkPlan): Boolean = unwrap(p) match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec |
           _: SortAggregateExec => true
      case other => other.children.exists(hasAgg)
    }
    def checkJoins(p: SparkPlan): Unit = unwrap(p) match {
      case j: SortMergeJoinExec => fail(s"sort-merge join planned:\n$j")
      case j: BroadcastHashJoinExec =>
        // every equi-join input must already be aggregated (a key-count
        // table), never a raw row-level scan
        assert(j.children.forall(hasAgg), s"raw-scan join side:\n$j")
        j.children.foreach(checkJoins)
      case j: ShuffledHashJoinExec =>
        assert(j.children.forall(hasAgg), s"raw-scan join side:\n$j")
        j.children.foreach(checkJoins)
      case other =>
        other.children.foreach(checkJoins)
        other.subqueries.foreach(checkJoins)
    }
    checkJoins(df.queryExecution.executedPlan)
    spark.catalog.clearCache()
  }

  test("filters and pruning reach the parquet scan through Tables.spread") {
    val q = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      plan.take(1500))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      plan.take(1500))
  }
}
