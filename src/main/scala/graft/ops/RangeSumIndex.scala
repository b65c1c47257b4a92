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
 *
 * Block arithmetic is FLOOR division throughout (pmod-based — Spark's
 * `div`/`%` truncate toward zero), so negative keys land in the block
 * that really spans them: with blockWidth 10, key −21 is in block −3
 * (keys −30..−21), and a range starting at −20 marks block −2 (keys
 * −20..−11) fully interior — trunc-division put −21..−29 in block −2
 * and silently overcounted such ranges (round-9 advice).
 */
object RangeSumIndex {

  /** floor(k / w) for longs via the non-negative remainder:
    * (k − pmod(k, w)) is always the largest multiple of w ≤ k, and the
    * final `div` is exact integral division (a `/` would ride doubles
    * and lose exactness past 2^53). */
  private def floorDiv(k: Column, w: Long): Column =
    call_function("div", k - pmod(k, lit(w)), lit(w))

  /** The index: one row per non-empty block —
    * (block, block_sum, block_n). Pure integer arithmetic. */
  def build(df: DataFrame, key: Column, value: Column,
            blockWidth: Long): DataFrame = {
    require(blockWidth >= 1, s"blockWidth >= 1: $blockWidth")
    df.select(key.cast("long").as("__k"), value.cast("long").as("__v"))
      .filter(col("__k").isNotNull)
      .groupBy(floorDiv(col("__k"), blockWidth).as("block"))
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
      .withColumn("b_lo", floorDiv(col("lo"), blockWidth))
      .withColumn("b_hi", floorDiv(col("hi"), blockWidth))
      // a range starting exactly on a block boundary makes that block
      // fully interior; same for one ending on the last key of a block
      // (pmod, not %: −20 % 10 = 0 either way, but −25 % 10 = −5 under
      // trunc semantics while the boundary test needs pmod's 5)
      .withColumn("full_lo", when(pmod(col("lo"), lit(blockWidth)) === 0,
        col("b_lo")).otherwise(col("b_lo") + 1L))
      .withColumn("full_hi",
        when(pmod(col("hi") + 1L, lit(blockWidth)) === 0, col("b_hi"))
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
      .withColumn("__b", floorDiv(col("__k"), blockWidth))
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

  /** GROUPED index: one row per non-empty (group, block) —
    * (g, block, block_sum, block_n). Same one-aggregation build as the
    * flat index; the group column rides the grouping key, so the index
    * stays metadata-sized per group (rows/blockWidth entries each). */
  def buildGrouped(df: DataFrame, group: Column, key: Column,
                   value: Column, blockWidth: Long): DataFrame = {
    require(blockWidth >= 1, s"blockWidth >= 1: $blockWidth")
    df.select(group.as("g"), key.cast("long").as("__k"),
        value.cast("long").as("__v"))
      .filter(col("__k").isNotNull)
      .groupBy(col("g"), floorDiv(col("__k"), blockWidth).as("block"))
      .agg(sum(col("__v")).as("block_sum"), count(lit(1)).as("block_n"))
  }

  /**
   * Grouped probe — MANY ranges PER GROUP in one pass (the windowed /
   * per-key analytics shape: "per event type, the value sum over k id
   * windows"): `ranges` is (id, g, lo, hi); decomposition is identical
   * to [[probe]] but every join carries the group key, so a range only
   * ever meets its own group's blocks. Returns
   * (id, g, lo, hi, range_sum, range_n).
   *
   * 100 TB shape: the grouped index is (groups × keyspan/blockWidth)
   * rows — still metadata relative to the data; ranges broadcast; the
   * edge scan touches ≤ 2 blocks per (range, group), never the table.
   */
  def probeGrouped(ranges: DataFrame, index: DataFrame, df: DataFrame,
                   group: Column, key: Column, value: Column,
                   blockWidth: Long): DataFrame = {
    val r = ranges.select(col("id"), col("g"),
        col("lo").cast("long").as("lo"), col("hi").cast("long").as("hi"))
      .withColumn("b_lo", floorDiv(col("lo"), blockWidth))
      .withColumn("b_hi", floorDiv(col("hi"), blockWidth))
      .withColumn("full_lo", when(pmod(col("lo"), lit(blockWidth)) === 0,
        col("b_lo")).otherwise(col("b_lo") + 1L))
      .withColumn("full_hi",
        when(pmod(col("hi") + 1L, lit(blockWidth)) === 0, col("b_hi"))
          .otherwise(col("b_hi") - 1L))
    val rb = broadcast(r).as("r")
    val interior = index.as("ix").join(rb,
        col("ix.g") === col("r.g") &&
          col("ix.block") >= col("r.full_lo") &&
          col("ix.block") <= col("r.full_hi"))
      .groupBy(col("r.id").as("id"))
      .agg(sum(col("ix.block_sum")).as("i_sum"),
        sum(col("ix.block_n")).as("i_n"))
    val rows = df.select(group.as("g"), key.cast("long").as("__k"),
        value.cast("long").as("__v"))
      .filter(col("__k").isNotNull)
      .withColumn("__b", floorDiv(col("__k"), blockWidth))
      .as("dt")
    val edges = rows.join(rb,
        col("dt.g") === col("r.g") &&
          (col("dt.__b") === col("r.b_lo") ||
            col("dt.__b") === col("r.b_hi")) &&
          col("dt.__k") >= col("r.lo") && col("dt.__k") <= col("r.hi") &&
          (col("dt.__b") < col("r.full_lo") ||
            col("dt.__b") > col("r.full_hi")))
      .groupBy(col("r.id").as("id"))
      .agg(sum(col("dt.__v")).as("e_sum"), count(lit(1)).as("e_n"))
    r.select(col("id"), col("g"), col("lo"), col("hi"))
      .join(interior, Seq("id"), "left_outer")
      .join(edges, Seq("id"), "left_outer")
      .select(col("id"), col("g"), col("lo"), col("hi"),
        (coalesce(col("i_sum"), lit(0L)) + coalesce(col("e_sum"), lit(0L)))
          .as("range_sum"),
        (coalesce(col("i_n"), lit(0L)) + coalesce(col("e_n"), lit(0L)))
          .as("range_n"))
  }
}
