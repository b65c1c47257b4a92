package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Block AGGREGATE index for range-sum queries — the materialized
 * counterpart of the zone manifest's stats (ZonedAggScan answers
 * FILTERLESS global aggregates from metadata; this answers ARBITRARY
 * key-range aggregates): keys are cut into fixed-width blocks, each
 * block stores (sum, count), and a range [lo, hi] decomposes into
 *
 *   interior blocks — answered from the INDEX alone (metadata), plus
 *   ≤ 2 edge blocks — answered by scanning only those blocks' rows.
 *
 * At 100 TB a range query touches O(range/blockWidth) index rows and
 * two blocks of data instead of the full table; the index itself is one
 * map-side-combinable aggregation (sums are a monoid), rows/blockWidth
 * entries. Classic segment-summary/OLAP-tile design.
 */
object RangeSumIndex {

  /** The index: one row per non-empty block —
    * (block, block_sum, block_n). Pure integer arithmetic. */
  def build(df: DataFrame, key: Column, value: Column,
            blockWidth: Long): DataFrame = {
    require(blockWidth >= 1, s"blockWidth >= 1: $blockWidth")
    df.select(key.cast("long").as("__k"), value.cast("long").as("__v"))
      .filter(col("__k").isNotNull)
      .groupBy(expr(s"__k div ${blockWidth}L").as("block"))
      .agg(sum(col("__v")).as("block_sum"), count(lit(1)).as("block_n"))
  }

  /**
   * Answer inclusive ranges [lo, hi] (a frame with long lo/hi columns
   * and a range id) against the index + the base table: per range,
   * interior-block sums come from the broadcast-joined index, edge rows
   * from a scan restricted to the ≤ 2·|ranges| edge blocks. Returns
   * (range id, lo, hi, range_sum, range_n).
   */
  def probe(ranges: DataFrame, index: DataFrame, df: DataFrame,
            key: Column, value: Column, blockWidth: Long): DataFrame = {
    val r = ranges.select(col("id"), col("lo").cast("long").as("lo"),
        col("hi").cast("long").as("hi"))
      .withColumn("b_lo", expr(s"lo div ${blockWidth}L"))
      .withColumn("b_hi", expr(s"hi div ${blockWidth}L"))
      // a range starting exactly on a block boundary makes that block
      // fully interior; same for one ending on the last key of a block
      .withColumn("full_lo", when(expr(s"lo % ${blockWidth}L = 0"),
        col("b_lo")).otherwise(col("b_lo") + 1L))
      .withColumn("full_hi",
        when(expr(s"(hi + 1) % ${blockWidth}L = 0"), col("b_hi"))
          .otherwise(col("b_hi") - 1L))
    // interior: index rows with full_lo <= block <= full_hi (range join
    // against the metadata-sized index — broadcast the ranges)
    val interior = index.join(broadcast(r),
        col("block") >= col("full_lo") && col("block") <= col("full_hi"))
      .groupBy(col("id"))
      .agg(sum(col("block_sum")).as("i_sum"), sum(col("block_n")).as("i_n"))
    // edges: scan ONLY rows whose block is an edge block of some range
    // and that fall inside [lo, hi] but OUTSIDE the interior span
    val rows = df.select(key.cast("long").as("__k"),
        value.cast("long").as("__v"))
      .filter(col("__k").isNotNull)
      .withColumn("__b", expr(s"__k div ${blockWidth}L"))
    val edges = rows.join(broadcast(r),
        (col("__b") === col("b_lo") || col("__b") === col("b_hi")) &&
          col("__k") >= col("lo") && col("__k") <= col("hi") &&
          (col("__b") < col("full_lo") || col("__b") > col("full_hi")))
      .groupBy(col("id"))
      .agg(sum(col("__v")).as("e_sum"), count(lit(1)).as("e_n"))
    r.select(col("id"), col("lo"), col("hi"))
      .join(interior, Seq("id"), "left_outer")
      .join(edges, Seq("id"), "left_outer")
      .select(col("id"), col("lo"), col("hi"),
        (coalesce(col("i_sum"), lit(0L)) + coalesce(col("e_sum"), lit(0L)))
          .as("range_sum"),
        (coalesce(col("i_n"), lit(0L)) + coalesce(col("e_n"), lit(0L)))
          .as("range_n"))
  }
}
