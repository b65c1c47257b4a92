package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Hierarchical (Merkle-style) table diff — locate WHERE two copies of a
 * table diverge without shipping or sorting rows, the anti-entropy scan
 * a replication/backfill job runs at 100 TB:
 *
 *   1. both sides reduce to per-COARSE-bucket (count, order-independent
 *      [[Checksum]] sum) — one map-side-combined hash aggregate each,
 *      output O(buckets);
 *   2. a full-outer compare of the two coarse summaries yields the
 *      DIRTY buckets (metadata-sized);
 *   3. only rows inside dirty coarse buckets (broadcast semi-join — the
 *      descent) are re-summarized at FINE granularity and compared.
 *
 * Clean subtrees cost exactly one checksum row end to end; the fine
 * pass rescans only the diverging fraction. The fine buckets must NEST
 * inside the coarse ones (caller contract, e.g. key DIV 512 inside
 * key DIV 4096) — a fine-level divergence then always surfaces inside a
 * dirty coarse bucket, modulo the checksum-sum collision bound
 * (48-bit md5 prefixes; adversarial cancellation, not random data, is
 * the only failure mode — the [[Checksum]] trade-off, disclosed there).
 */
object MerkleDiff {

  private def summarize(df: DataFrame, bucket: Column, name: String,
                        rowCols: Seq[Column]): DataFrame =
    df.groupBy(bucket.as(name))
      .agg(count(lit(1)).as("n"),
        sum(Checksum.rowDigest(rowCols)).cast(DecimalType(38, 0)).as("cs"))

  /**
   * Differing FINE buckets between `src` and `dst`: one row per fine
   * bucket whose (count, checksum) differ, with both sides' counts
   * (0 when the bucket is absent) and checksums ('0' when absent) and
   * `kind` = "rows" (counts differ — drops/dupes) vs "content" (same
   * count, different bytes — corruption). `rowCols` are evaluated
   * against EACH side's columns by name.
   */
  def diff(src: DataFrame, dst: DataFrame, coarseBucket: Column,
           fineBucket: Column, rowCols: Seq[Column]): DataFrame = {
    val s1 = summarize(src, coarseBucket, "cb", rowCols)
    val d1 = summarize(dst, coarseBucket, "cb", rowCols)
    val dirty = s1.as("s").join(d1.as("d"),
        col("s.cb") === col("d.cb"), "full_outer")
      .filter(!(col("s.n") <=> col("d.n")) || !(col("s.cs") <=> col("d.cs")))
      .select(coalesce(col("s.cb"), col("d.cb")).as("cb"))
    // `dirty` feeds BOTH descents: stage it (metadata-sized) so the two
    // coarse table scans behind it run once, not once per side — and pin
    // the bucket-sized result before the scope closes (CacheScope
    // discipline; exchange reuse is plan-shape luck, never a contract)
    CacheScope.withStages(dirty) {
      def descend(side: DataFrame): DataFrame =
        summarize(side.join(broadcast(dirty), coarseBucket === col("cb"),
          "left_semi"), fineBucket, "fb", rowCols)
      CacheScope.pin(descend(src).as("s").join(descend(dst).as("d"),
          col("s.fb") === col("d.fb"), "full_outer")
        .filter(!(col("s.n") <=> col("d.n")) ||
          !(col("s.cs") <=> col("d.cs")))
        .select(coalesce(col("s.fb"), col("d.fb")).as("fb"),
          coalesce(col("s.n"), lit(0L)).as("n_src"),
          coalesce(col("d.n"), lit(0L)).as("n_dst"),
          coalesce(col("s.cs"), lit(0)).cast(DecimalType(38, 0))
            .cast("string").as("cs_src"),
          coalesce(col("d.cs"), lit(0)).cast(DecimalType(38, 0))
            .cast("string").as("cs_dst"))
        .withColumn("kind",
          when(!(col("n_src") <=> col("n_dst")), "rows")
            .otherwise("content")))
    }
  }
}
