package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality operators — the Deequ-style contract checks a 100 TB
 * ingest runs before anything downstream trusts the data. Three shapes:
 *
 *  - [[contractReport]]: one pass over one table, every declared check a
 *    conditional aggregate — N checks cost ONE scan (the naive one-query-
 *    per-check harness scans N times);
 *  - [[orphanCount]]: referential integrity as a LEFT ANTI join — the
 *    null-safe formulation (`NOT EXISTS`, not `NOT IN`, which a single
 *    NULL key silently vacuums to empty);
 *  - [[profile]]: per-column null/distinct profile — one multi-aggregate
 *    scan melted to (column, metric) rows afterwards, not one scan per
 *    column.
 *
 * Everything returns exact counts (no sampling), so reports are
 * engine-reproducible and oracle-gateable.
 */
object DataQuality {

  /** Named row-level checks → one row of violation counts + n_rows.
    * Each check column is a BOOLEAN "row violates". */
  def contractReport(df: DataFrame,
                     checks: Seq[(String, Column)]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      checks.map { case (name, bad) =>
        count(when(bad, lit(1))).as(name)
      }: _*)

  /** Rows of `child` whose `childKey` has no match in `parent.parentKey`
    * — counted, not materialized (the audit number, not the spill). */
  def orphanCount(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame =
    child.join(
        parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))

  /** (col_name, n_nulls, n_distinct) per listed column, from ONE scan:
    * a single multi-aggregate row, melted driver-side (the melt input is
    * one row — constant work regardless of table size). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
    }
    // collect the ONE aggregate row and melt on the driver — a union of
    // per-column selects over the aggregate would re-run the scan per
    // branch; this is one scan + constant driver work
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val data = cols.map { c =>
      (c, row.getAs[Long](s"__nn_$c"), row.getAs[Long](s"__nd_$c"))
    }
    df.sparkSession.createDataFrame(data)
      .toDF("col_name", "n_nulls", "n_distinct")
  }

  /**
   * Benford first-digit profile of a positive monetary column — the
   * classic fabricated-data / unit-mixup alarm. Digits are extracted
   * WITHOUT floating transcendentals (no log10, whose libm rounding
   * differs across engines): the amount is fixed-pointed to integer
   * cents (`round(x·100)` — one stated IEEE multiply both engines share
   * bit-for-bit), and the first significant digit is the leading
   * character of the integer's decimal rendering. Output per digit:
   * exact count and the exact basis-point share `n·10⁴ div total`
   * (integer division — no ratio ever leaves integer arithmetic).
   * One map + one 9-key hash agg; the share join broadcasts a 1-row
   * total, the standing tiny-aggregate pattern.
   */
  def benfordProfile(df: DataFrame, amount: Column): DataFrame = {
    val cents = round(amount * 100).cast("long")
    val digits = df.select(
        substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("total"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("(n * 10000) DIV total").as("share_bp"))
  }
}
