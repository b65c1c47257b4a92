// Check PushedFilters still reach the scan through Tables.spread's repartition
import org.apache.spark.sql.functions._
{
  spark.sparkContext.setLogLevel("WARN")
  val dir = "/root/testdata/sf0.01"
  val li = graft.Tables.lineitem(spark, dir)
  val q = li.filter(col("l_quantity") > 45).select("l_orderkey", "l_quantity")
  println("[probe] partitions after load = " + li.rdd.getNumPartitions)
  val plan = q.queryExecution.executedPlan.toString
  println("[probe] PushedFilters line: " +
    plan.linesIterator.filter(_.contains("PushedFilters")).mkString(" | "))
  println("[probe] ReadSchema line: " +
    plan.linesIterator.filter(_.contains("ReadSchema")).mkString(" | "))
  println("[probe] has Exchange = " + plan.contains("Exchange"))
}
System.exit(0)
