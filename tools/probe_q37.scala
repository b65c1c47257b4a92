// Probe: where do q37's 45 s go at sf0.1?
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ops._
import graft.Tables

{
  val dir = "/root/testdata/sf0.1"
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.shuffle.partitions", 32)

  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-40s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def clearCache(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

  // warmup on sf0.001 like bench does
  t("warmup q37 sf0.001") {
    Curation.curate(Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text",
      minQuality = 0.5, nearDupThreshold = 0.5).orderBy(col("doc_id")).write.format("noop").mode("overwrite").save()
  }
  t("warmup q26 sf0.001") {
    Dedup.minhashLshPairs(Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text",
      n = 2, k = 64, bands = 16, threshold = 0.5).orderBy(col("id_a"), col("id_b")).write.format("noop").mode("overwrite").save()
  }
  clearCache()

  // baseline q26 at sf0.1
  t("q26 as-is sf0.1") {
    Dedup.minhashLshPairs(Tables.documents(spark, dir), "doc_id", "text",
      n = 2, k = 64, bands = 16, threshold = 0.5).orderBy(col("id_a"), col("id_b")).write.format("noop").mode("overwrite").save()
  }
  clearCache()

  // q37 as-is
  t("q37 as-is sf0.1") {
    Curation.curate(Tables.documents(spark, dir), "doc_id", "text",
      minQuality = 0.5, nearDupThreshold = 0.5).orderBy(col("doc_id")).write.format("noop").mode("overwrite").save()
  }
  clearCache()

  // q37 decomposed with forced persists
  val docs = Tables.documents(spark, dir)
  val scored = docs.select(col("doc_id"), col("text"),
    TextAnalysis.langId(col("text")).as("lang_pred"),
    TextAnalysis.qualityScore(col("text"), "[.,!?;:]").as("quality"))
  val gated = scored.filter(col("lang_pred") =!= "und" && col("quality") >= 0.5).persist(StorageLevel.MEMORY_AND_DISK)
  t("force gated")(println("[probe] gated rows = " + gated.count()))
  val keepers = gated.groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
    .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
  val deduped = gated.join(keepers, Seq("doc_id"), "left_semi").persist(StorageLevel.MEMORY_AND_DISK)
  t("force deduped")(println("[probe] deduped rows = " + deduped.count()))
  val losers = t("lsh pairs over deduped (forced input)") {
    val p = Dedup.minhashLshPairs(deduped, "doc_id", "text", n = 2, threshold = 0.5)
      .select(col("id_b").as("doc_id")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    println("[probe] losers = " + p.count()); p
  }
  t("final anti-join") {
    deduped.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_pred"), col("quality"))
      .orderBy(col("doc_id")).write.format("noop").mode("overwrite").save()
  }
  clearCache()
}
System.exit(0)
