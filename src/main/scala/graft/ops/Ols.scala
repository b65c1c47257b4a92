package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * EXACT grouped ordinary-least-squares fit — slope and intercept of
 * y over x per group as INTEGER rational pairs, no IEEE anywhere:
 *
 *   slope = sxyC / sxxC            sxyC = n·Σxy − Σx·Σy
 *   icpt  = (Σy·sxxC − sxyC·Σx)    sxxC = n·Σxx − (Σx)²
 *           ─────────────────
 *               n·sxxC
 *
 * The regression every metrics warehouse runs (trend of spend vs
 * volume, calibration of a linear scorer) — computed as ONE hash
 * aggregate of five sufficient statistics and a metadata-sized
 * arithmetic epilogue. Per-row products are formed in long (bounded by
 * the value domain) and SUMMED in DECIMAL(38,0) — at warehouse row
 * counts the raw second moments overflow int64 long before the data
 * stops fitting a cluster ([[Auc]]/[[CardEst]] discipline); the DuckDB
 * twin mirrors every step in HUGEINT. Numerator/denominator surface as
 * exact decimal strings (the q187 contract): the caller divides, the
 * gate hash-compares integers.
 *
 * Scale shape: map-side-combinable aggregate (5 sums + a count) —
 * shuffle is #groups rows, nothing else; no window, no second pass.
 */
object Ols {

  /**
   * One row per group: n, slope_num/slope_den, icpt_num/icpt_den
   * (DECIMAL(38,0) as strings). Rows with null x or y are excluded.
   * A single-valued-x group yields slope_den = 0 — undefined slope
   * surfaced as a zero denominator, never a fabricated value.
   */
  def groupedFit(df: DataFrame, groupCol: Column, xCol: Column,
                 yCol: Column): DataFrame = {
    val d = "decimal(38,0)"
    df.select(groupCol.as("g"), xCol.cast("long").as("x"),
        yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).cast(d).as("n"),
        sum(col("x").cast(d)).as("sx"),
        sum(col("y").cast(d)).as("sy"),
        sum((col("x") * col("x")).cast(d)).as("sxx"),
        sum((col("x") * col("y")).cast(d)).as("sxy"))
      .withColumn("sxy_c", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("sxx_c", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col("g"),
        col("n").cast("long").as("n"),
        col("sxy_c").cast(d).cast("string").as("slope_num"),
        col("sxx_c").cast(d).cast("string").as("slope_den"),
        (col("sy") * col("sxx_c") - col("sxy_c") * col("sx"))
          .cast(d).cast("string").as("icpt_num"),
        (col("n") * col("sxx_c")).cast(d).cast("string").as("icpt_den"))
  }
}
