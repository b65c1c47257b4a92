package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

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
 * SAME batch id and content, so when version b is already COMMITTED
 * (_SUCCESS present) the replay's merge would recompute the identical
 * rows — mergeBatch therefore SKIPS it outright. That skip is what makes
 * a replay safe for concurrent readers: published version directories
 * are never deleted or rewritten in place (an overwrite would yank part
 * files from under any DataFrame that already planned its scan over the
 * old listing — the round-9 SketchStreamSpec race), and an UNcommitted
 * directory (torn write after a crash) is invisible to readers —
 * committedVersions requires _SUCCESS — so overwriting THAT is safe.
 * Versions > the replayed id are by construction absent (a batch id
 * commits only after the batch ran).
 *
 * All path handling goes through Hadoop's FileSystem API resolved from
 * the store URI itself, so the store may live on any supported
 * filesystem (file://, hdfs://, s3a://, ...) — `java.io.File` would
 * silently see an empty store on anything but a local path, turning
 * every micro-batch into a from-scratch overwrite.
 */
object PartialStore {

  private def versionDir(store: String, id: Long) = f"$store/v$id%020d"

  private def fs(store: String, conf: Configuration): FileSystem =
    new Path(store).getFileSystem(conf)

  /** Committed (has _SUCCESS) version ids currently in the store. */
  private def committedVersions(store: String, conf: Configuration): Seq[Long] = {
    val hdfs = fs(store, conf)
    val root = new Path(store)
    if (!hdfs.exists(root) || !hdfs.getFileStatus(root).isDirectory) Nil
    else hdfs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v") &&
        hdfs.exists(new Path(st.getPath, "_SUCCESS")))
      .flatMap(st => st.getPath.getName.drop(1).toLongOption)
  }

  /** Newest committed (_SUCCESS) version strictly below `beforeId`. */
  def latestVersion(store: String, beforeId: Long = Long.MaxValue,
                    conf: Configuration = new Configuration()): Option[Long] =
    committedVersions(store, conf).filter(_ < beforeId).maxOption

  /** One micro-batch: partials of `batch` merged into the newest store
    * version < `batchId`, written as version `batchId`. Public because it
    * is exactly what a replay re-invokes — the specs call it directly.
    * A replay of an already-COMMITTED version is a no-op (deterministic
    * merge of the same parent + same content ⇒ identical rows), which
    * keeps published files immutable under concurrent readers. */
  def mergeBatch(batch: DataFrame, batchId: Long, store: String,
                 keyCols: Seq[String], valueCol: String): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(versionDir(store, batchId))
    if (fs(store, conf).exists(new Path(target, "_SUCCESS"))) return
    val batchPartials =
      IncrementalAgg.partials(batch, keyCols, valueCol)
    val merged = latestVersion(store, beforeId = batchId, conf = conf) match {
      case Some(v) => IncrementalAgg.merge(
        spark.read.parquet(versionDir(store, v)), batchPartials, keyCols)
      case None => batchPartials
    }
    merged.write.mode("overwrite").parquet(versionDir(store, batchId))
  }

  /** Read-time view of the newest committed partials, finalized. */
  def readLatest(spark: org.apache.spark.sql.SparkSession,
                 store: String): Option[DataFrame] =
    latestVersion(store, conf = spark.sparkContext.hadoopConfiguration)
      .map(v =>
        IncrementalAgg.finalize(spark.read.parquet(versionDir(store, v))))

  /** Storage hygiene: delete all committed versions except the newest
    * `keep`. `keep >= 2` is a hard floor — version n is the replay parent
    * of version n+1, and a replayed batch whose parent was pruned would
    * silently rebuild the store from that one batch alone, discarding all
    * accumulated history. Keeping the live version plus its parent makes
    * prune safe to run at ANY point relative to the checkpoint commit.
    * Uncommitted directories (no _SUCCESS: in-flight or torn writes) are
    * left alone; returns the deleted version ids. Run it from the same
    * foreachBatch after the merge, or as a side maintenance job. */
  def prune(store: String, keep: Int = 2,
            conf: Configuration = new Configuration()): Seq[Long] = {
    require(keep >= 2,
      s"keep=$keep must retain the live version AND its replay parent")
    val hdfs = fs(store, conf)
    committedVersions(store, conf).sorted(Ordering[Long].reverse)
      .drop(keep)
      .map { id =>
        hdfs.delete(new Path(versionDir(store, id)), true)
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
