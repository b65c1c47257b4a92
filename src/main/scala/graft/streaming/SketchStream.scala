package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ops.CountMin

/**
 * STREAMING count-min ingest — the composition the sketch was built for:
 * each micro-batch folds into the stored sketch in O(batch + sketch)
 * and the raw history is never re-read.
 *
 * Composition, not new machinery: [[graft.ops.CountMin.build]] turns the
 * batch into its cell table (the sketch is a monoid — cell-wise sums),
 * and [[PartialStore.mergeBatch]] folds those cells into the VERSIONED
 * parquet store keyed by (d, bucket) — inheriting, verbatim, the store's
 * replay-idempotence contract (a replayed batch id recomputes its own
 * version from the same parent, never double-counts) and its bounded
 * state story (the "state" is ≤ depth×width rows in storage, zero rows
 * in stream state). q212 gates the merge≡oneshot algebra batch-side;
 * SketchStreamSpec drives it through a real MemoryStream +
 * foreachBatch + checkpoint, plus a direct replay.
 */
object SketchStream {

  /** One micro-batch: the batch's CMS cells merged into the store as
    * version `batchId`. Public — a replay re-invokes exactly this. */
  def mergeCmsBatch(batch: DataFrame, batchId: Long, store: String,
                    key: Column, depth: Int, width: Int): Unit = {
    val cells = CountMin.build(batch, key, depth, width)
      .withColumnRenamed("n", "w")
    PartialStore.mergeBatch(cells, batchId, store,
      keyCols = Seq("d", "bucket"), valueCol = "w")
  }

  /** Wire a streaming frame into the stored sketch (append mode — each
    * batch carries raw new rows; the store, not stream state,
    * accumulates). */
  def writeCmsCells(events: DataFrame, store: String, checkpoint: String,
                    key: Column, depth: Int = 4, width: Int = 64)
      : StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeCmsBatch(batch, batchId, store, key, depth, width)
      }
      .start()

  /** The accumulated cell table (d, bucket, n) from the newest committed
    * store version — the exact shape [[CountMin.estimate]] probes, so
    * stored-sketch estimates reuse the batch decode path unchanged. */
  def readCells(spark: SparkSession, store: String): Option[DataFrame] =
    PartialStore.readLatest(spark, store).map(df =>
      df.select(col("d"), col("bucket"),
        col("total").cast("long").as("n")))
}
