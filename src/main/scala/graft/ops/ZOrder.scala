package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering: interleave the bits of two key columns and
 * lay the table out in z-key ranges, so ONE physical sort order serves
 * min/max data skipping on BOTH dimensions — the standard answer to
 * "queries filter on user OR on day, which do I sort by?" at 100 TB.
 * A linear sort on (a, b) gives perfect pruning on `a` and none on `b`;
 * the z-curve bounds every file's span in both, so point/range predicates
 * on either column prune to O(few) files (Delta/Iceberg OPTIMIZE ZORDER
 * ship exactly this).
 *
 * The interleave is the classic magic-number bit spread — pure integer
 * shifts/masks, reproducible in any engine (the DuckDB oracle runs the
 * same five-step spread in SQL), codegen-friendly, no UDF.
 *
 * Scale shape: computing the key is map-only; clustering is ONE
 * repartitionByRange on the key (a range shuffle with sampled bounds) +
 * an in-partition sort — the same cost as any global sort-write, with
 * two-dimensional skipping bought for it.
 */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions 0,2,…,30. */
  def spread16(c: Column): Column = {
    val m0 = lit(0xFFFFL)
    val s1 = (c.bitwiseAND(m0)) // x & 0xFFFF
    val s2 = (s1.bitwiseOR(shiftleft(s1, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s4 = (s3.bitwiseOR(shiftleft(s3, 2))).bitwiseAND(lit(0x33333333L))
    (s4.bitwiseOR(shiftleft(s4, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of (low-16-bits-of-x, low-16-bits-of-y):
    * x occupies even bits, y odd bits. */
  def zkey2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same key as ONE fused native expression
    * ([[graft.functions.MortonKey]] — bit-equality spec'd vs the chain):
    * the layout hot path computes it twice per row (range-sampling pass +
    * write pass), so the fused form halves the expression-tree work. */
  def zkeyNative(x: Column, y: Column): Column =
    call_function("morton_key", x, y)

  /** Cluster `df` into `numFiles` z-key ranges of (xCol, yCol), sorted
    * within each range — write the result with a plain `.write.parquet`
    * and every file carries tight min/max bounds on BOTH columns. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 numFiles: Int): DataFrame = {
    val z = zkeyNative(col(xCol), col(yCol)).as("__zkey")
    df.withColumn("__zkey", z)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }
}
