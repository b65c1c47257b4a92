package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Trend detection over keyed daily series — the statistical-monitoring
 * layer a corpus/metrics warehouse runs on top of its day buckets (is a
 * source growing? did a metric's regime shift? is the series seasonal?).
 * Every statistic here is stated in EXACT integer arithmetic on integer
 * (x = epoch day, y = count) inputs, so results hash-gate across engines
 * with no IEEE caveat:
 *
 *  - OLS slope sign/magnitude as the cross-multiplied pair
 *    (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) — the slope is their ratio, and the
 *    numerator alone carries the trend direction (denominator > 0
 *    whenever ≥2 distinct days);
 *  - CUSUM changepoint: cumulative sums of the mean-centered series,
 *    scaled by n to stay integral (dᵢ = n·yᵢ − Σy), argmax |cum| with
 *    ties pinned to the earliest day;
 *  - lag-k autocovariance components via a day+k self-equi-join (true
 *    calendar lag — gaps pair with nothing, unlike a positional LEAD).
 *
 * 100 TB shape: everything downstream of the day bucket is METADATA-SCALE
 * — the daily aggregate is one map-side-combined hash agg over the raw
 * table (the only pass that touches data volume), and the per-key series
 * it emits is bounded by keys × days, so the windows/self-joins here run
 * on kilobytes no matter the corpus size. Magnitudes: |x| ≤ ~2×10⁴
 * (epoch days), so n·Σx² fits a BIGINT until ~10¹⁰ daily rows per key.
 */
object Trend {

  /** Daily counts per key: (key, x = epoch day BIGINT, y = count). */
  def dailyCounts(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df.groupBy(col(keyCol),
        datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
          .cast("long").as("x"))
      .agg(count(lit(1)).as("y"))

  /**
   * Exact OLS slope components per key over (x, y):
   * (key, n_days, slope_num = n·Σxy − Σx·Σy, slope_den = n·Σx² − (Σx)²,
   * direction ∈ {up, down, flat}).
   */
  def olsSlope(daily: DataFrame, keyCol: String): DataFrame =
    daily.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"))
      .select(col(keyCol),
        col("n_days"),
        (col("n_days") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n_days") * col("sx2") - col("sx") * col("sx")).as("slope_den"),
        when(col("n_days") * col("sxy") > col("sx") * col("sy"), "up")
          .when(col("n_days") * col("sxy") < col("sx") * col("sy"), "down")
          .otherwise("flat").as("direction"))

  /**
   * CUSUM changepoint per key: the day where the cumulative sum of the
   * mean-centered daily series peaks in absolute value — the classic
   * single-changepoint locator. Kept integral by scaling with n
   * (cumᵢ = Σ_{j≤i} (n·yⱼ − T), T = Σy); ties break to the earliest day.
   * Returns (key, n_days, total, cp_day, max_abs_cumdev).
   */
  def cusumChangepoint(daily: DataFrame, keyCol: String): DataFrame = {
    val tot = Window.partitionBy(col(keyCol))
    val cum = Window.partitionBy(col(keyCol)).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withDev = daily
      .withColumn("n", count(lit(1)).over(tot))
      .withColumn("t", sum(col("y")).over(tot))
      .withColumn("c", sum(col("n") * col("y") - col("t")).over(cum))
    val pick = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("c")).desc, col("x").asc)
    withDev
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col(keyCol), col("n").as("n_days"), col("t").as("total"),
        col("x").as("cp_day"), abs(col("c")).as("max_abs_cumdev"))
  }

  /**
   * Lag-k autocovariance components of ONE daily series (x, y) for each
   * k in `lags`: n pairs, Σy_t, Σy_{t+k}, Σ y_t·y_{t+k}, and the
   * autocovariance numerator n·Σy_t·y_{t+k} − Σy_t·Σy_{t+k} (its sign is
   * the lag-k correlation sign). Pairs come from a day+k self-join, so
   * calendar gaps are respected.
   */
  def lagAutocov(daily: DataFrame, lags: Seq[Int]): DataFrame = {
    val base = daily.select(col("x"), col("y"))
    lags.map { k =>
      val a = base.select(col("x"), col("y").as("y1"))
      val b = base.select((col("x") - k).as("x"), col("y").as("y2"))
      a.join(b, "x")
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("y1")).as("s1"),
          sum(col("y2")).as("s2"),
          sum(col("y1") * col("y2")).as("s12"))
        .select(lit(k).cast("int").as("lag"), col("n_pairs"), col("s1"),
          col("s2"), col("s12"),
          (col("n_pairs") * col("s12") - col("s1") * col("s2"))
            .as("autocov_num"))
    }.reduce(_ unionByName _)
  }
}
