package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization operators: resample an irregular event stream
 * onto a fixed grid (per key), fill the holes, and carry values forward.
 * The standard prelude to any windowed feature computation over activity
 * logs — ML feature pipelines want one row per (key, period), not one row
 * per event.
 *
 * Scale shape: the spine is generated WITH the data (per-key `sequence` +
 * `explode` off the key's own min/max — no driver-side date loop, no
 * cross join against a global calendar), so spine size is Σ_key(span_key),
 * never |keys| × global_span. The fill is one window pass per key ordered
 * by the grid — a single shuffle on the key that AQE can coalesce.
 * Forward-fill uses `last(ignoreNulls)` over the unbounded-preceding
 * frame, which Spark evaluates in one running pass (no per-row rescan).
 */
object TimeSeries {

  /**
   * Aggregate `df` to one row per (key, day-of `tsCol`), then densify each
   * key's day range [min-day, max-day] and forward-fill `valueAgg` holes.
   *
   * Output: key, day, n (0 on gap days), value (sum on active days,
   * carried forward on gaps; null until the first active day).
   *
   * `valueAgg` must be an exact (order-insensitive) aggregate — pass a
   * DECIMAL-cast sum, not a raw double sum, or the hash gate breaks.
   */
  def dailyForwardFill(df: DataFrame, keyCol: String, tsCol: String,
                       valueAgg: Column): DataFrame = {
    val day = to_date(col(tsCol))
    val daily = df
      .groupBy(col(keyCol), day.as("day"))
      .agg(count(lit(1)).as("n"), valueAgg.as("day_value"))

    // `daily` feeds BOTH the spine derivation and the join probe — stage
    // it (CacheScope), or the events aggregation runs twice (plan-audited:
    // no ReusedExchange fires across the two subtrees). Result is pinned,
    // caller owns the unpersist — the dense grid is Σ-span-bounded.
    CacheScope.withStages(daily) {
      // per-key spine: sequence(min_day, max_day) exploded — generated
      // from the aggregated frame (one row per active day), never events
      val spine = daily
        .groupBy(col(keyCol))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col(keyCol),
          explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY")))
            .as("day"))

      val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      CacheScope.pin(spine.join(daily, Seq(keyCol, "day"), "left")
        .select(
          col(keyCol), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("day_value"), ignoreNulls = true).over(w).as("value")))
    }
  }

  /**
   * Per-key daily anomaly detection: z-score of each day's event count
   * against ITS key's day-count distribution, flagged at |z| > `zThresh`.
   *
   * The statistics are derived from EXACT integer sums so the doubles are
   * engine-reproducible (the q88 gate): with D = #days, S = Σn, Q = Σn²
   * (all BIGINT — overflow throws under ANSI rather than corrupting),
   *   μ  = double(S) / D
   *   σ² = double(D·Q − S²) / double(D·(D−1))   (sample variance)
   *   z  = (double(n) − μ) / sqrt(σ²)
   * — each step ONE IEEE op on deterministic inputs, never an
   * order-dependent float aggregation (stddev_samp over doubles sums in
   * shuffle order; this formulation never sums a float). z is NULL when
   * D < 2 or σ² = 0 (a constant series has no anomalies; also dodges
   * ANSI's divide-by-zero on degenerate keys).
   *
   * Shape: one hash aggregate to (key, day) counts, one window pass per
   * key for (D, S, Q) — counts-table-sized input, trivially small output
   * per key. At 100 TB the counts table is |keys|×|days| rows, nothing
   * like the event volume.
   */
  def anomalyDays(events: DataFrame, keyCol: String, tsCol: String,
                  zThresh: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val byKey = Window.partitionBy(col(keyCol))
    val stats = daily
      .withColumn("__d", count(lit(1)).over(byKey))
      .withColumn("__s", sum(col("n")).over(byKey))
      .withColumn("__q", sum(col("n") * col("n")).over(byKey))
    val mu = col("__s").cast("double") / col("__d").cast("double")
    val variance = (col("__d") * col("__q") - col("__s") * col("__s"))
      .cast("double") / (col("__d") * (col("__d") - 1)).cast("double")
    stats
      .withColumn("zscore",
        when(col("__d") >= 2 && variance > 0,
          (col("n").cast("double") - mu) / sqrt(variance)))
      .withColumn("is_anomaly",
        coalesce(abs(col("zscore")) > zThresh, lit(false)))
      .select(col(keyCol), col("day"), col("n"), col("zscore"),
        col("is_anomaly"))
  }

  /**
   * Trailing-window active-user counts: for every day with data, the
   * DISTINCT users seen in the last `windowDays` days (WAU for 7), that
   * day's DAU, and the DAU/WAU stickiness ratio.
   *
   * Exact sliding distinct without a range self-join: dedupe to
   * (user, day) pairs, then map-side EXPAND each pair to the `windowDays`
   * observation days it supports — a fixed ×W row expansion of the
   * already-deduped pair table (linear, shuffle-friendly), against which
   * one hash aggregate per observation day counts distinct users. The
   * count-distinct runs on (obs_day, user) — Spark's two-phase distinct
   * aggregate — and DAU rides the same pass via a conditional distinct.
   * The alternative, count(DISTINCT) over a RANGE window frame, Spark
   * does not support, and a day×day interval join shuffles the pair
   * table W times over.
   */
  def trailingActiveUsers(events: DataFrame, tsCol: String, userCol: String,
                          windowDays: Int = 7): DataFrame = {
    val ud = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    val days = ud.select(col("day")).distinct()
    val expanded = ud
      .select(col("user"), explode(sequence(lit(0),
        lit(windowDays - 1))).as("off"),
        col("day"))
      .select(col("user"), col("off"), date_add(col("day"), col("off")).as("obs_day"))
    expanded
      .join(days.withColumnRenamed("day", "obs_day"), "obs_day")
      .groupBy(col("obs_day").as("day"))
      .agg(countDistinct(col("user")).as("wau"),
        countDistinct(when(col("off") === 0, col("user"))).as("dau"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("wau").cast("double"))
  }
}
