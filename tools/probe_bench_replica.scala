// Replicate Bench.scala's exact sequence to find where q37's 45 s comes from:
// full sf0.001 warmup of all queries (no cache clearing), ensureIndex, then
// the timed sf0.1 loop in sorted order. Prints per-query times + cache stats.
import graft._

{
  val dir = "/root/testdata/sf0.1"
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  spark.conf.set("spark.sql.adaptive.enabled", "true")

  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s   cachedRDDs=${spark.sparkContext.getPersistentRDDs.size}")
    r
  }

  t("warmup-all-sf0.001") {
    SparkEntry.queries.values.foreach { fn =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
  }
  t("ensureIndex") {
    try graft.ops.BucketedAnn.ensureIndex(spark, dir)
    catch { case e: Throwable => println("[probe] ensureIndex FAILED: " + e) }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    t(name) {
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[probe] $name failed: $e") }
    }
  }
}
System.exit(0)
