package graft.streaming

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ops.IncrementalAgg

/**
 * Streaming twin of [[graft.ops.IncrementalAgg]]: fold each micro-batch's
 * partial aggregates into a VERSIONED parquet store instead of holding
 * running aggregates in stream state. This is the bounded-state answer
 * for metrics over unbounded key spaces (per-day × per-key groups grow
 * forever; stream state must not): per batch the work is O(batch +
 * touched groups), state lives in storage, and a cold restart needs no
 * state migration — the store IS the state.
 *
 * Versioning gives replay idempotence without a transactional format:
 * batch b always merges the batch data into the newest version < b and
 * writes version b. Structured Streaming replays a failed batch with the
 * SAME batch id and content, so the replay recomputes version b from the
 * same inputs — converging, never double-counting (the double-run spec
 * asserts this byte-for-byte). Versions > the replayed id are by
 * construction absent (a batch id commits only after the batch ran).
 */
object PartialStore {

  private def versionDir(store: String, id: Long) = f"$store/v$id%020d"

  /** Newest committed (_SUCCESS) version strictly below `beforeId`. */
  def latestVersion(store: String, beforeId: Long = Long.MaxValue): Option[Long] = {
    val root = new File(store)
    if (!root.isDirectory) None
    else root.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        new File(f, "_SUCCESS").exists())
      .flatMap(f => f.getName.drop(1).toLongOption)
      .filter(_ < beforeId)
      .maxOption
  }

  /** One micro-batch: partials of `batch` merged into the newest store
    * version < `batchId`, written as version `batchId`. Public because it
    * is exactly what a replay re-invokes — the specs call it directly. */
  def mergeBatch(batch: DataFrame, batchId: Long, store: String,
                 keyCols: Seq[String], valueCol: String): Unit = {
    val spark = batch.sparkSession
    val batchPartials =
      IncrementalAgg.partials(batch, keyCols, valueCol)
    val merged = latestVersion(store, beforeId = batchId) match {
      case Some(v) => IncrementalAgg.merge(
        spark.read.parquet(versionDir(store, v)), batchPartials, keyCols)
      case None => batchPartials
    }
    merged.write.mode("overwrite").parquet(versionDir(store, batchId))
  }

  /** Read-time view of the newest committed partials, finalized. */
  def readLatest(spark: org.apache.spark.sql.SparkSession,
                 store: String): Option[DataFrame] =
    latestVersion(store).map(v =>
      IncrementalAgg.finalize(spark.read.parquet(versionDir(store, v))))

  /** Storage hygiene: delete all committed versions except the newest
    * `keep` (default 2 — the live one plus the replay parent). Uncommitted
    * directories (no _SUCCESS: in-flight or torn writes) are left alone;
    * returns the deleted version ids. Run it from the same foreachBatch
    * after the merge, or as a side maintenance job. */
  def prune(store: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 1, s"keep=$keep must retain at least the live version")
    val root = new File(store)
    if (!root.isDirectory) return Nil
    val committed = root.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        new File(f, "_SUCCESS").exists())
      .flatMap(f => f.getName.drop(1).toLongOption.map(_ -> f))
      .sortBy(-_._1)
    committed.drop(keep).map { case (id, dir) =>
      def rm(f: File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
      id
    }
  }

  /** Wire a streaming event frame (with a `ts` column) into the store as
    * per-(day) value partials. Append mode: each batch carries raw NEW
    * rows only — the merge, not stream state, accumulates history. */
  def writeDailyPartials(events: DataFrame, store: String,
                         checkpoint: String,
                         valueCol: String = "value"): StreamingQuery =
    events
      .withColumn("day", to_date(col("ts")))
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, store, Seq("day"), valueCol)
      }
      .start()
}
