package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Dedup
import graft.streaming.IngestPipeline

/**
 * The streaming LLM-ingest pipeline end to end: a real Structured
 * Streaming flow whose micro-batches dedup internally, against the
 * stored corpus index, and against the frozen protected index; whose
 * survivors extend the store (so batch 1 sees batch 0); and whose
 * replayed batches converge byte-for-byte instead of double-writing.
 */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  // word-block texts: docs of the same family are identical (J = 1.0 —
  // LSH recall certain); different families share no bigram (J = 0)
  private def text(fam: String) =
    (1 to 40).map(i => s"$fam$i").mkString(" ")

  test("stream: internal + cross-corpus + decontamination drops, index update, replay converges") {
    val tmp = Files.createTempDirectory("graft-ingest").toString
    val storeDir = s"$tmp/store"
    val checkpoint = s"$tmp/chk"

    // corpus (train index): doc 100; protected (frozen val/test): doc 200
    IngestPipeline.writeIndexSlice(
      Seq((100L, text("ca"))).toDF("doc_id", "text"),
      storeDir, IngestPipeline.CorpusBatchId)
    val protIdx = Dedup.buildMinhashIndex(
      Seq((200L, text("pa"))).toDF("doc_id", "text"), "doc_id", "text", n = 2)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = IngestPipeline.startIngest(docs, storeDir, protIdx, checkpoint)
    try {
      // batch 0: 1 dups corpus, 2 dups protected, (3,4) internal pair,
      // 5 unique → survivors {3, 5}
      mem.addData((1L, text("ca")), (2L, text("pa")),
        (3L, text("xa")), (4L, text("xa")), (5L, text("ua")))
      q.processAllAvailable()
      // batch 1: 6 dups batch-0 SURVIVOR 3 (visible only through the
      // index-UPDATE step), 7 unique → survivors {7}
      mem.addData((6L, text("xa")), (7L, text("va")))
      q.processAllAvailable()
    } finally q.stop()

    def survivors(): Seq[(Long, Long)] =
      IngestPipeline.readSurvivors(spark, storeDir)
        .selectExpr("CAST(ingest_batch AS BIGINT)", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val expected = Seq((0L, 3L), (0L, 5L), (1L, 7L))
    assert(survivors() === expected)

    // REPLAY batch 1 (same id, same content — exactly what Structured
    // Streaming re-invokes after a failure): output must converge, not
    // double-write, and the replay must not see its own prior signatures
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    IngestPipeline.processBatch(
      Seq((6L, text("xa")), (7L, text("va"))).toDF("doc_id", "text"),
      1L, storeDir, protIdx)
    assert(survivors() === expected, "replayed batch must converge")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"processBatch leaked cache entries: $leaked")

    // the stored index now covers corpus + both batches' survivors only
    val indexed = IngestPipeline
      .readIndexBefore(spark, storeDir, Long.MaxValue)
      .bands.select("id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(indexed === Set(100L, 3L, 5L, 7L),
      "index must hold exactly corpus + survivors (never dropped docs)")
  }

  test("index roll-up: sealed partitions consolidate; drop decisions, replay and store content unchanged") {
    // identical batch sequence through two stores — one rolled up
    // mid-stream, one not — must yield identical survivors, identical
    // logical index content, and a smaller file count on the rolled store
    def runFlow(rollupAt: Option[Long]): (Seq[(Long, Long)], Set[Long], Int, String) = {
      val tmp = Files.createTempDirectory("graft-rollup").toString
      val storeDir = s"$tmp/store"
      IngestPipeline.writeIndexSlice(
        Seq((100L, text("ca"))).toDF("doc_id", "text"),
        storeDir, IngestPipeline.CorpusBatchId)
      val protIdx = Dedup.buildMinhashIndex(
        Seq((200L, text("pa"))).toDF("doc_id", "text"), "doc_id", "text", n = 2)
      def batch(rows: (Long, String)*) = rows.toDF("doc_id", "text")
      // b0: both unique; b1: 3 dups the corpus; b2: 5 dups b0's survivor 1
      // (visible only through the index — the roll-up must preserve it),
      // 6 unique
      IngestPipeline.processBatch(batch((1L, text("aa")), (2L, text("ba"))),
        0L, storeDir, protIdx)
      IngestPipeline.processBatch(batch((3L, text("ca")), (4L, text("da"))),
        1L, storeDir, protIdx)
      rollupAt.foreach(sb => IngestPipeline.rollupIndexStore(spark, storeDir,
        sealedBefore = sb, targetBytes = 64L * 1024 * 1024))
      val b2 = batch((5L, text("aa")), (6L, text("ea")))
      IngestPipeline.processBatch(b2, 2L, storeDir, protIdx)
      // replay batch 2 ACROSS the roll-up boundary: must converge
      IngestPipeline.processBatch(b2, 2L, storeDir, protIdx)
      val surv = IngestPipeline.readSurvivors(spark, storeDir)
        .selectExpr("CAST(ingest_batch AS BIGINT)", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val ids = IngestPipeline.readIndexBefore(spark, storeDir, Long.MaxValue)
        .bands.select("id").distinct().collect().map(_.getLong(0)).toSet
      (surv, ids,
        IngestPipeline.storeFileCount(s"$storeDir/__tier=bands"), storeDir)
    }
    val (survPlain, idsPlain, filesPlain, _) = runFlow(None)
    val (survRolled, idsRolled, filesRolled, rolledDir) = runFlow(Some(2L))
    val expected = Seq((0L, 1L), (0L, 2L), (1L, 4L), (2L, 6L))
    assert(survPlain === expected)
    assert(survRolled === survPlain, "roll-up changed drop decisions")
    assert(idsRolled === idsPlain && idsRolled === Set(100L, 1L, 2L, 4L, 6L))
    assert(filesRolled < filesPlain,
      s"roll-up must shrink the store: $filesRolled vs $filesPlain files")
    // sealed dirs really consolidated: only the label (1) and the open
    // batch (2) partitions remain
    val dirs = new java.io.File(s"$rolledDir/__tier=bands").listFiles()
      .map(_.getName).filter(_.startsWith("ingest_batch=")).sorted.toSeq
    assert(dirs === Seq("ingest_batch=1", "ingest_batch=2"))
    // idempotence: a second roll-up at the same seal point is a no-op
    val before = IngestPipeline.readIndexBefore(spark, rolledDir, Long.MaxValue)
      .bands.collect().map(_.toString).sorted.toSeq
    IngestPipeline.rollupIndexStore(spark, rolledDir, sealedBefore = 2L)
    val after = IngestPipeline.readIndexBefore(spark, rolledDir, Long.MaxValue)
      .bands.collect().map(_.toString).sorted.toSeq
    assert(after === before)
  }

  test("roll-up crash window: a committed staged slice is recovered on the next roll-up") {
    import java.nio.file.{Files => F, Paths, StandardCopyOption}
    val tmp = Files.createTempDirectory("graft-rollup-crash").toString
    val storeDir = s"$tmp/store"
    IngestPipeline.writeIndexSlice(
      Seq((100L, text("ca"))).toDF("doc_id", "text"),
      storeDir, IngestPipeline.CorpusBatchId)
    val protIdx = Dedup.buildMinhashIndex(
      Seq((200L, text("pa"))).toDF("doc_id", "text"), "doc_id", "text", n = 2)
    IngestPipeline.processBatch(
      Seq((1L, text("aa"))).toDF("doc_id", "text"), 0L, storeDir, protIdx)
    IngestPipeline.processBatch(
      Seq((2L, text("ba"))).toDF("doc_id", "text"), 1L, storeDir, protIdx)
    val before = IngestPipeline.readIndexBefore(spark, storeDir, Long.MaxValue)
      .bands.orderBy($"id", $"band_idx").collect().map(_.toString).toSeq

    // simulate the worst crash window of rollupIndexStore: phase 1 staged
    // and committed (_SUCCESS), sealed partition dirs ALREADY DELETED,
    // phase-2 move never ran — the store read alone would lose rows
    for (sub <- Seq("bands", "base")) {
      val dir = s"$storeDir/__tier=$sub"
      val staging = Paths.get(dir, ".rollup_staging")
      F.createDirectories(staging)
      // stage = the exact consolidated slice phase 1 writes
      spark.read.parquet(dir).filter($"ingest_batch" < 2).drop("ingest_batch")
        .repartition(1).write.mode("overwrite").parquet(staging.toString)
      assert(F.exists(staging.resolve("_SUCCESS")))
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("ingest_batch=") &&
          f.getName.stripPrefix("ingest_batch=").toLong < 2)
        .foreach(f => {
          val s = F.walk(f.toPath)
          try s.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => F.deleteIfExists(p))
          finally s.close()
        })
    }
    // next roll-up entry must complete the move BEFORE anything else
    IngestPipeline.rollupIndexStore(spark, storeDir, sealedBefore = 2L)
    val after = IngestPipeline.readIndexBefore(spark, storeDir, Long.MaxValue)
      .bands.orderBy($"id", $"band_idx").collect().map(_.toString).toSeq
    assert(after === before, "recovery must restore the full sealed slice")
    assert(!F.exists(Paths.get(s"$storeDir/__tier=bands/.rollup_staging")),
      "staging must be cleared after recovery")
  }

  test("a replayed batch is blind to its own failed attempt's index slice") {
    val tmp = Files.createTempDirectory("graft-ingest-r").toString
    val storeDir = s"$tmp/store"
    IngestPipeline.writeIndexSlice(
      Seq((100L, text("ca"))).toDF("doc_id", "text"),
      storeDir, IngestPipeline.CorpusBatchId)
    val protIdx = Dedup.buildMinhashIndex(
      Seq((200L, text("pa"))).toDF("doc_id", "text"), "doc_id", "text", n = 2)
    val batch = Seq((10L, text("za")), (11L, text("wa"))).toDF("doc_id", "text")
    // first attempt writes batch 0's slice...
    IngestPipeline.processBatch(batch, 0L, storeDir, protIdx)
    // ...replay must read index < 0 only (corpus), so 10/11 are compared
    // against the corpus, NOT against their own failed-attempt signatures
    // (which would self-suppress nothing here but WOULD change candidate
    // sets on near-identical siblings); the partition-pruned read is the
    // guarantee
    val idx = IngestPipeline.readIndexBefore(spark, storeDir, beforeId = 0L)
    assert(idx.bands.select("id").distinct()
      .collect().map(_.getLong(0)).toSet === Set(100L))
    IngestPipeline.processBatch(batch, 0L, storeDir, protIdx)
    val out = IngestPipeline.readSurvivors(spark, storeDir)
      .selectExpr("CAST(ingest_batch AS BIGINT)", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(out === Seq((0L, 10L), (0L, 11L)))
  }
}
