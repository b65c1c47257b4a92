// Round-13: q224/q225 plan-shape probe — the semi/anti disjunctive
// rewrite must leave ZERO BroadcastNestedLoopJoin in the executed plan.
{
  spark.sparkContext.setLogLevel("WARN")
  def nl(df: org.apache.spark.sql.DataFrame): Int = df.queryExecution.executedPlan.toString.split('\n').count(_.contains("BroadcastNestedLoopJoin"))
  val q224 = graft.queries.FrontierQueries.q224ExistsDisjunct(spark, "/root/testdata/sf0.01")
  val q225 = graft.queries.FrontierQueries.q225NotExistsDisjunct(spark, "/root/testdata/sf0.01")
  println(s"[probe] q224 BNLJ=${nl(q224)} rows=${q224.count()}")
  println(s"[probe] q225 BNLJ=${nl(q225)} rows=${q225.count()}")
  println(q224.queryExecution.executedPlan.toString.split('\n').filter(l => l.contains("Join")).mkString("\n"))
}
