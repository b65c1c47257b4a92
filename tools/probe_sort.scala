// Does q01's orderBy survive .coalesce(1) in the executed plan?
{
  spark.sparkContext.setLogLevel("WARN")
  val dir = "/root/testdata/sf0.01"
  val q = graft.queries.CoreQueries.q01ScanFilterProject(spark, dir)
  println("[probe] --- without coalesce:")
  println(q.queryExecution.executedPlan.toString.linesIterator.take(8).map("[probe] " + _).mkString("\n"))
  println("[probe] --- with coalesce(1):")
  println(q.coalesce(1).queryExecution.executedPlan.toString.linesIterator.take(10).map("[probe] " + _).mkString("\n"))
  val rows = q.coalesce(1).collect()
  val sortedOk = rows.map(r => (r.getLong(0), r.getInt(1))).sliding(2).forall(p => p.length < 2 || (p(0)._1 < p(1)._1 || (p(0)._1 == p(1)._1 && p(0)._2 <= p(1)._2)))
  println("[probe] rows in order = " + sortedOk)
}
System.exit(0)
