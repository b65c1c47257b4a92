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
}
