package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ops.Dedup
import graft.ops.Dedup.MinhashIndex

/**
 * The streaming LLM-ingest pipeline — the gated pieces wired into ONE
 * Structured Streaming flow (SURVEY §2.9's north star made real):
 *
 *   micro-batch of new docs
 *     → batch-internal near-dup drop  (minhashLshPairs on the batch)
 *     → cross-corpus near-dup drop    (minhashLshPairsIncremental vs the
 *                                      STORED index — O(batch) per ingest)
 *     → decontamination               (same incremental engine vs the
 *                                      PROTECTED index: frozen val/test +
 *                                      benchmark docs, disjoint from the
 *                                      train index)
 *     → append survivors AND their signatures to the store
 *                                     (the index-UPDATE step: batch b+1
 *                                      dedups against batch b's survivors)
 *     → keyed idempotent upsert of the survivors.
 *
 * Replay contract (the PartialStore discipline, §2.9): every write is
 * partitioned by `ingest_batch` and lands via DYNAMIC partition
 * overwrite, so a replayed micro-batch rewrites exactly its own
 * partition; and the index read for batch b takes only partitions
 * `ingest_batch < b`, so a replay never sees the failed attempt's own
 * signatures. Batch content + batch id are deterministic under
 * Structured Streaming's replay, hence so is every drop decision —
 * the double-run spec asserts byte-stable output.
 *
 * Scale shape: per batch the work is O(batch) signatures (map-side) +
 * band-key joins against a partition-pruned stored band table; nothing
 * ever recomputes the corpus. The stored index is the same artifact the
 * batch engine writes ([[graft.ops.Dedup.buildMinhashIndex]]) — batch
 * bootstrap and streaming ingest share one format.
 */
object IngestPipeline {

  /** The corpus bootstrap's batch id: every real micro-batch (ids ≥ 0)
    * dedups against it. */
  val CorpusBatchId: Long = -1L

  private def bandsDir(indexDir: String) = s"$indexDir/bands"
  private def baseDir(indexDir: String) = s"$indexDir/base"

  private def writePartitioned(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite)
      .partitionBy("ingest_batch").parquet(path)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Append `docs`' LSH artifacts to the stored index as partition
    * `ingest_batch=batchId` (dynamic overwrite — replay-idempotent).
    * The `base` stage (shingle sets + signatures, the expensive map-side
    * pass) is staged for the slice write: `bands` derives from it, so
    * without the stage the two writes would each recompute the
    * signatures from the raw text. */
  def writeIndexSlice(docs: DataFrame, indexDir: String, batchId: Long,
                      idCol: String = "doc_id", textCol: String = "text",
                      n: Int = 2, k: Int = 64, bands: Int = 16): Unit = {
    val idx = Dedup.buildMinhashIndex(docs, idCol, textCol, n, k, bands)
    graft.ops.CacheScope.withStages(idx.base) {
      writePartitioned(idx.bands.withColumn("ingest_batch", lit(batchId)),
        bandsDir(indexDir))
      writePartitioned(idx.base.withColumn("ingest_batch", lit(batchId)),
        baseDir(indexDir))
    }
  }

  /** The stored index restricted to partitions `ingest_batch < beforeId`
    * — a partition-PRUNED read (the filter is on the partition column),
    * which is what makes a replayed batch blind to its own failed
    * attempt's writes. */
  def readIndexBefore(spark: SparkSession, indexDir: String,
                      beforeId: Long): MinhashIndex = {
    def part(path: String) = spark.read.parquet(path)
      .filter(col("ingest_batch") < beforeId).drop("ingest_batch")
    MinhashIndex(part(bandsDir(indexDir)), part(baseDir(indexDir)))
  }

  /**
   * One micro-batch of the ingest flow; public because a REPLAY re-invokes
   * exactly this (the specs call it directly, like PartialStore.mergeBatch).
   *
   * Drop rules (each an independent predicate over the batch — the batch
   * twin's oracle states them the same way):
   *  - internal: the HIGHER id of any batch-internal near-dup pair;
   *  - cross-corpus: any doc with a near-dup in the stored train index;
   *  - contamination: any doc with a near-dup in the protected index.
   * Survivors land in `outDir` AND their signatures extend the store —
   * the index-UPDATE step that makes batch b+1 see batch b.
   */
  def processBatch(batch: DataFrame, batchId: Long,
                   indexDir: String, protectedIdx: MinhashIndex,
                   outDir: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   n: Int = 2, k: Int = 64, bands: Int = 16,
                   threshold: Double = 0.5): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val corpusIdx = readIndexBefore(spark, indexDir, beforeId = batchId)
    // ONE batch index feeds all three pair tiers AND the survivor slice
    // write: the signatures (the expensive map-side artifact) are staged
    // once per micro-batch, never recomputed per consumer
    val batchIdx = Dedup.buildMinhashIndex(batch, idCol, textCol, n, k, bands)
    graft.ops.CacheScope.withStages(batchIdx.base, batchIdx.bands) {
      val internal = Dedup.lshPairsWithin(batchIdx, threshold)
      val cross = Dedup.lshPairsAgainst(batchIdx, corpusIdx, threshold)
      val contam = Dedup.lshPairsAgainst(batchIdx, protectedIdx, threshold)
      val drops = internal.select(col("id_b").as("__drop"))
        .unionByName(cross.select(col("new_id").as("__drop")))
        .unionByName(contam.select(col("new_id").as("__drop")))
        .distinct()
      val survivors = batch
        .join(drops, col(idCol) === col("__drop"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        writePartitioned(survivors.withColumn("ingest_batch", lit(batchId)),
          outDir)
        // survivor index slice from the SAME staged artifacts
        val survIds = survivors.select(col(idCol).as("id"))
        writePartitioned(batchIdx.bands.join(survIds, "id")
          .withColumn("ingest_batch", lit(batchId)), bandsDir(indexDir))
        writePartitioned(batchIdx.base.join(survIds, "id")
          .withColumn("ingest_batch", lit(batchId)), baseDir(indexDir))
      } finally survivors.unpersist(blocking = false)
    }
  }

  // ----------------------------------------------------- index roll-up

  /** Part-file count of a store directory (maintenance observability). */
  def storeFileCount(dir: String): Int = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) 0
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.getFileName.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
  }

  /**
   * Roll up the SEALED slice of the index store: consolidate every
   * partition `ingest_batch < sealedBefore` (the corpus bootstrap at −1
   * included) into ONE size-targeted partition labeled
   * `ingest_batch = sealedBefore − 1`.
   *
   * Why: the replay contract partitions by `ingest_batch`, so thousands
   * of micro-batches accrete thousands of partition directories of small
   * files, and every `readIndexBefore` pays the listing (the r5 verdict's
   * first operational gap). A batch is SEALED once Structured Streaming
   * has committed it — only the last uncommitted batch can ever replay —
   * so `sealedBefore` must be ≤ the last committed batch id, and then no
   * future read ever needs to distinguish WHICH sealed batch a signature
   * came from: `ingest_batch < b` for every open b ≥ sealedBefore
   * includes the consolidated label `sealedBefore − 1`, same rows, same
   * drop decisions (IngestPipelineSpec replays a batch across a
   * mid-stream roll-up and asserts byte-stable output).
   *
   * Crash safety (local FS here; the same two-phase layout works on any
   * store with atomic file moves): the consolidated slice is first
   * written to a dot-prefixed staging dir INSIDE the store (readers
   * ignore dot-paths) with parquet's own `_SUCCESS` as the commit mark;
   * only then are the sealed partition dirs deleted and the staged files
   * moved into the final partition dir. A crash before the deletes
   * leaves the store untouched; a crash after them leaves the staged
   * slice complete on disk, and the next roll-up (or this one, re-run)
   * finishes the move first — `completeStagedMove` runs at entry.
   */
  def rollupIndexStore(spark: SparkSession, indexDir: String,
                       sealedBefore: Long,
                       targetBytes: Long = 128L * 1024 * 1024): Unit =
    Seq(bandsDir(indexDir), baseDir(indexDir))
      .foreach(d => rollupDir(spark, d, sealedBefore, targetBytes))

  private def stagingDir(dir: String) = s"$dir/.rollup_staging"

  /** Partition dirs `ingest_batch=v` with v < sealedBefore. */
  private def sealedPartDirs(dir: String,
                             sealedBefore: Long): Seq[java.nio.file.Path] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) Nil
    else {
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScalaSeq.filter { p =>
        val nm = p.getFileName.toString
        nm.startsWith("ingest_batch=") &&
          scala.util.Try(nm.stripPrefix("ingest_batch=").toLong)
            .toOption.exists(_ < sealedBefore)
      } finally s.close()
    }
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScalaSeq: Seq[A] = {
      val b = Seq.newBuilder[A]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
      finally s.close()
    }
  }

  /** Phase 2 (idempotent): if a committed staged slice exists, move its
    * parquet files into the final partition dir and drop the staging. */
  private def completeStagedMove(dir: String, label: Long): Unit = {
    val staging = java.nio.file.Paths.get(stagingDir(dir))
    if (java.nio.file.Files.exists(staging.resolve("_SUCCESS"))) {
      val target = java.nio.file.Paths.get(dir, s"ingest_batch=$label")
      java.nio.file.Files.createDirectories(target)
      val s = java.nio.file.Files.list(staging)
      try s.iterator().asScalaSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach { f =>
          java.nio.file.Files.move(f, target.resolve(f.getFileName.toString),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } finally s.close()
    }
    deleteRecursively(staging)
  }

  private def rollupDir(spark: SparkSession, dir: String, sealedBefore: Long,
                        targetBytes: Long): Unit = {
    val label = sealedBefore - 1
    completeStagedMove(dir, label) // finish a crashed predecessor first
    val sealedDirs = sealedPartDirs(dir, sealedBefore)
    if (sealedDirs.size <= 1) return // nothing to consolidate
    val bytes = sealedDirs.map { p =>
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScalaSeq
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
      finally s.close()
    }.sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    // phase 1: stage the consolidated slice (readers ignore the dot-dir);
    // parquet's _SUCCESS is the commit mark completeStagedMove keys on
    spark.read.parquet(dir)
      .filter(col("ingest_batch") < sealedBefore)
      .drop("ingest_batch")
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(stagingDir(dir))
    // phase 2: swap — destructive only after the staged slice is committed
    sealedDirs.foreach(deleteRecursively)
    completeStagedMove(dir, label)
  }

  /** Wire a streaming doc frame into the flow. The protected index is
    * the frozen artifact of the held-out splits — loaded once, never
    * updated by ingest (its composition is the thing decontamination
    * protects). */
  def startIngest(docs: DataFrame, indexDir: String,
                  protectedIdx: MinhashIndex, outDir: String,
                  checkpoint: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  n: Int = 2, k: Int = 64, bands: Int = 16,
                  threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexDir, protectedIdx, outDir,
          idCol, textCol, n, k, bands, threshold)
      }
      .start()

  /** All survivors accumulated in `outDir`, with their batch ids. */
  def readSurvivors(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
