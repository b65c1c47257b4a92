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
}
