// Probe 2: decompose minhashLshPairs internals for parquet vs cached input
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.storage.StorageLevel
import graft.ops._
import graft.Tables

{
  val dir = "/root/testdata/sf0.1"
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.shuffle.partitions", 32)

  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-44s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def clearCache(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

  def lshDecomposed(tag: String, docs: DataFrame): Unit = {
    val n = 2; val k = 64; val bands = 16; val threshold = 0.5; val maxBucket = 1000
    println(s"[probe] --- $tag: input partitions = ${docs.rdd.getNumPartitions}")
    val base = Dedup.hashedShingleSets(docs, "doc_id", "text", n).persist(StorageLevel.MEMORY_AND_DISK)
    t(s"$tag base (shingles)")(println("[probe]   base rows = " + base.count() + ", parts = " + base.rdd.getNumPartitions))
    val sigs = base.withColumn("sig", Dedup.minhashSignature(col("ih"), k))
      .withColumn("band", explode(Dedup.lshBands(col("sig"), k, bands)))
      .select(col("id"), col("band.band_idx"), col("band.band_hash")).persist(StorageLevel.MEMORY_AND_DISK)
    t(s"$tag sigs (signature+bands)")(println("[probe]   sigs rows = " + sigs.count() + ", parts = " + sigs.rdd.getNumPartitions))
    val okBuckets = sigs.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("bucket_n")).filter(col("bucket_n").between(2, maxBucket))
      .select(col("band_idx"), col("band_hash"))
    val eligible = sigs.join(okBuckets, Seq("band_idx", "band_hash"))
    val a = eligible.select(col("band_idx"), col("band_hash"), col("id").as("id_a"))
    val b = eligible.select(col("band_idx"), col("band_hash"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b")).select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    t(s"$tag candidate pairs")(println("[probe]   pairs = " + pairs.count()))
    val verified = Dedup.verifyJaccardPairs(pairs, base, threshold)
    t(s"$tag verify")(println("[probe]   verified = " + verified.count()))
    clearCache()
  }

  // warmup
  t("warmup q26 sf0.001") {
    Dedup.minhashLshPairs(Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text",
      n = 2, k = 64, bands = 16, threshold = 0.5).orderBy(col("id_a"), col("id_b")).write.format("noop").mode("overwrite").save()
  }
  clearCache()

  lshDecomposed("parquet", Tables.documents(spark, dir))

  // cached gated+deduped input, as in curate
  val docs = Tables.documents(spark, dir)
  val scored = docs.select(col("doc_id"), col("text"),
    TextAnalysis.langId(col("text")).as("lang_pred"),
    TextAnalysis.qualityScore(col("text"), "[.,!?;:]").as("quality"))
  val gated = scored.filter(col("lang_pred") =!= "und" && col("quality") >= 0.5).persist(StorageLevel.MEMORY_AND_DISK)
  gated.count()
  val keepers = gated.groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
    .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
  val deduped = gated.join(keepers, Seq("doc_id"), "left_semi").persist(StorageLevel.MEMORY_AND_DISK)
  deduped.count()
  lshDecomposed("cached-deduped", deduped)

  // and the un-forced variant: deduped NOT persisted (as current curate does)
  val deduped2 = gated.join(keepers, Seq("doc_id"), "left_semi")
  lshDecomposed("unforced-deduped", deduped2)
}
System.exit(0)
