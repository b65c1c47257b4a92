package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Small-file compaction — the storage-maintenance job every long-lived
 * 100 TB table needs: streaming ingests and fine-grained partition
 * overwrites accrete files far below the scan-efficient size, until file
 * listing and per-file open overhead dominate scans (the "millions of tiny
 * files" failure mode). Compaction rewrites a table at a target file size,
 * optionally sorting within partitions so rewritten row groups carry tight
 * min/max stats for predicate skipping.
 *
 * Scale shape: one pass — scan, optional repartition-by-range (cluster
 * keys) or round-robin (size only), write. No driver-side file juggling;
 * the FileIndex supplies sizes. Write to a NEW directory and swap
 * atomically at the catalog/path level — compacting in place would race
 * readers.
 */
object Compaction {

  /** Total bytes and file count of a parquet table, from the file index
    * (no data scan). */
  def layout(spark: SparkSession, dir: String): (Long, Int) = {
    val files = spark.read.parquet(dir).inputFiles
    val sizes = files.map(f =>
      java.nio.file.Files.size(java.nio.file.Paths.get(
        new java.net.URI(f).getPath)))
    (sizes.sum, files.length)
  }

  /**
   * Rewrite `inDir` into `outDir` targeting `targetBytes` per file.
   * `clusterBy` non-empty → range-partition + sort within partitions on
   * those columns (data-skipping-friendly layout); empty → round-robin
   * (pure size normalization).
   */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              clusterBy: Seq[String] = Nil): Unit = {
    val (totalBytes, _) = layout(spark, inDir)
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    val shaped =
      if (clusterBy.nonEmpty) {
        val cols = clusterBy.map(col)
        df.repartitionByRange(nFiles, cols: _*)
          .sortWithinPartitions(cols: _*)
      } else df.repartition(nFiles)
    shaped.write.mode(SaveMode.Overwrite).parquet(outDir)
  }
}
