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
    * `ingest_batch=batchId` (dynamic overwrite — replay-idempotent). */
  def writeIndexSlice(docs: DataFrame, indexDir: String, batchId: Long,
                      idCol: String = "doc_id", textCol: String = "text",
                      n: Int = 2, k: Int = 64, bands: Int = 16): Unit = {
    val idx = Dedup.buildMinhashIndex(docs, idCol, textCol, n, k, bands)
    writePartitioned(idx.bands.withColumn("ingest_batch", lit(batchId)),
      bandsDir(indexDir))
    writePartitioned(idx.base.withColumn("ingest_batch", lit(batchId)),
      baseDir(indexDir))
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
