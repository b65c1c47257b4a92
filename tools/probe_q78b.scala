// Probe: q78 after the stored-protected-index + staged-slice fixes.
import org.apache.spark.sql.functions._

{
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  val sc = spark.sparkContext
  def jobs(): Int = sc.statusTracker.getJobIdsForGroup(null).length
  def t[A](name: String)(f: => A): A = {
    val j0 = jobs(); val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-34s ${(System.nanoTime()-t0)/1e9}%8.2f s  jobs=${jobs()-j0}")
    r
  }
  t("warmup full q78 sf0.001") {
    graft.queries.ExtQueries.q78StreamingIngestTwin(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
  }
  t("FULL q78 sf0.1 pass1") {
    graft.queries.ExtQueries.q78StreamingIngestTwin(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()
  }
  t("FULL q78 sf0.1 pass2") {
    graft.queries.ExtQueries.q78StreamingIngestTwin(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()
  }
  println("[probe] done")
}
System.exit(0)
