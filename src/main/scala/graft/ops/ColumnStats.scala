package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * ANALYZE-style column statistics — the optimizer-statistics collector
 * (exact NDV, null count, most-common-values with exact frequencies) that
 * feeds a cost-based optimizer next to the equi-depth histogram (q173).
 *
 * The naive collector runs one `GROUP BY col` per column — k shuffles of
 * the full table for k columns. This one STACKS the audited columns into
 * (col_name, value) pairs map-side (an in-row array + explode, no
 * exchange) and pays ONE hash aggregate over (col_name, value); every
 * statistic is then derived from that already-collapsed value-frequency
 * table: NDV = rows per col_name, null_count = the null group's count,
 * MCVs = rank ≤ topK per col_name (a WindowGroupLimit — Spark pushes the
 * per-group limit below the sort, so only topK+ties rows per column
 * survive the rank exchange). Value-frequency cardinality is Σ NDV(col)
 * ≪ row count for the categorical columns a CBO keeps MCVs for, so the
 * post-shuffle stages are metadata-scale at any corpus size.
 */
object ColumnStats {

  /**
   * One row per (column, MCV rank ≤ `topK`): column-level stats
   * (`n_rows`, `n_nulls`, `ndv`) alongside that rank's value and exact
   * count. Ties rank by count DESC then value ASC (deterministic).
   * `cols` must be string-typed (no cast-rendering ambiguity).
   */
  def stackedStats(df: DataFrame, cols: Seq[String], topK: Int): DataFrame = {
    require(cols.nonEmpty)
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).as("value"))): _*)).as("s"))
      .select(col("s.col_name").as("col_name"), col("s.value").as("value"))

    val freq = stacked.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("cnt"))

    val perCol = freq.groupBy(col("col_name"))
      .agg(sum(col("cnt")).cast("long").as("n_rows"),
        sum(when(col("value").isNull, col("cnt")).otherwise(0L))
          .cast("long").as("n_nulls"),
        count(col("value")).as("ndv"))

    val mcv = freq.filter(col("value").isNotNull)
      .withColumn("mcv_rank", row_number().over(
        Window.partitionBy(col("col_name"))
          .orderBy(col("cnt").desc, col("value"))))
      .filter(col("mcv_rank") <= topK)

    // LEFT join: a column whose values are ALL null has no MCV rows, but
    // its (n_rows, n_nulls, ndv) stats must still surface — an ANALYZE
    // collector that silently drops a column is worse than one reporting
    // "no non-null values" (null mcv_rank/mcv_value/mcv_count).
    perCol.join(mcv, Seq("col_name"), "left_outer")
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("ndv"),
        col("mcv_rank"), col("value").as("mcv_value"), col("cnt").as("mcv_count"))
  }
}
