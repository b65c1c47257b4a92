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
