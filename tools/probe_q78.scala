// Probe: where do q78's ~7.8 s go at sf0.1? Phase breakdown + job counts.
import org.apache.spark.sql.functions._
import graft.ops._
import graft.Tables
import graft.streaming.IngestPipeline

{
  val dir = "/root/testdata/sf0.1"
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.shuffle.partitions", 32)

  val sc = spark.sparkContext
  def jobs(): Int = sc.statusTracker.getJobIdsForGroup(null).length
  def t[A](name: String)(f: => A): A = {
    val j0 = jobs(); val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-34s ${(System.nanoTime()-t0)/1e9}%8.2f s  jobs=${jobs()-j0}")
    r
  }

  // warmup at sf0.001 (bench does the same)
  t("warmup full q78 sf0.001") {
    graft.queries.ExtQueries.q78StreamingIngestTwin(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
  }

  // --- full query, as benched
  t("FULL q78 sf0.1") {
    graft.queries.ExtQueries.q78StreamingIngestTwin(spark, dir)
      .write.format("noop").mode("overwrite").save()
  }

  // --- phase breakdown (replicates q78 body)
  val docs = Tables.documents(spark, dir)
  def splitOf(c: org.apache.spark.sql.Column) = {
    val bucket = pmod(c * lit(2654435761L), lit(1L << 32)) % 100
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
  }
  val stock = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
  val corpus = stock.filter(splitOf(col("doc_id")) === "train")
  val prot = stock.filter(splitOf(col("doc_id")) =!= "train")
  val b0 = docs.filter(col("doc_id") % 10 === 0)
  val b1 = docs.filter(col("doc_id") % 10 === 5)
  val tmp = java.nio.file.Files.createTempDirectory("graft-probe78").toString
  val indexDir = s"$tmp/index"
  val outDir = s"$tmp/out"

  t("phase: writeIndexSlice(corpus)") {
    IngestPipeline.writeIndexSlice(corpus, indexDir, IngestPipeline.CorpusBatchId)
  }
  val protIdx = Dedup.buildMinhashIndex(prot, "doc_id", "text", n = 2)
  t("phase: processBatch b0") {
    IngestPipeline.processBatch(b0, 0L, indexDir, protIdx, outDir)
  }
  t("phase: processBatch b1") {
    IngestPipeline.processBatch(b1, 1L, indexDir, protIdx, outDir)
  }
  t("phase: readSurvivors+sort") {
    IngestPipeline.readSurvivors(spark, outDir)
      .select(col("ingest_batch").cast("long").as("ingest_batch"),
        col("doc_id"), col("source"))
      .orderBy(col("ingest_batch"), col("doc_id"))
      .write.format("noop").mode("overwrite").save()
  }

  // --- sub-breakdown of one batch: how much is the protected-index rebuild?
  val tmp2 = java.nio.file.Files.createTempDirectory("graft-probe78b").toString
  IngestPipeline.writeIndexSlice(corpus, s"$tmp2/index", IngestPipeline.CorpusBatchId)
  val protIdx2 = Dedup.buildMinhashIndex(prot, "doc_id", "text", n = 2)
  import org.apache.spark.storage.StorageLevel
  val protBase = protIdx2.base.persist(StorageLevel.MEMORY_AND_DISK)
  val protBands = protIdx2.bands.persist(StorageLevel.MEMORY_AND_DISK)
  t("prot index materialize (cached)") { protBase.count(); protBands.count() }
  val protCached = Dedup.MinhashIndex(protBands, protBase)
  t("processBatch b0 (prot cached)") {
    IngestPipeline.processBatch(b0, 0L, s"$tmp2/index", protCached, s"$tmp2/out")
  }
  t("processBatch b1 (prot cached)") {
    IngestPipeline.processBatch(b1, 1L, s"$tmp2/index", protCached, s"$tmp2/out")
  }
  println("[probe] done")
}
System.exit(0)
