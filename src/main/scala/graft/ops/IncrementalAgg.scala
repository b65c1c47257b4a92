package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental aggregate maintenance: keep a stored table of PARTIAL
 * aggregates per group and fold new batches into it without touching
 * history — the materialized-view shape every 100 TB metrics pipeline
 * runs (recomputing a year of dailies because one day arrived late is
 * the anti-pattern this replaces).
 *
 * The partial schema is the algebraic one — (count, sum, min, max) —
 * every component commutative + associative, so merging partials in any
 * order or grouping equals the full recompute EXACTLY (sums ride DECIMAL:
 * double addition is not associative, decimal addition is). avg is
 * derived at read time as sum/count, never stored.
 *
 * Scale shape: each ingest aggregates ONLY the batch (map-side partials +
 * one shuffle on the group key), then one co-grouped merge against the
 * stored partials — O(batch + touched groups), never O(history). The
 * merge is itself a groupBy over the union, so Spark executes it as one
 * hash aggregate; with the store bucketed on the key the exchange
 * disappears entirely.
 */
object IncrementalAgg {

  /** Partial aggregates of `valueCol` per `keyCols`: n, sum (DECIMAL),
    * vmin, vmax. */
  def partials(df: DataFrame, keyCols: Seq[String],
               valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("vsum"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))

  /** Fold `batchPartials` into `storedPartials` (same schema): groups in
    * either side survive, overlapping groups merge component-wise. */
  def merge(storedPartials: DataFrame, batchPartials: DataFrame,
            keyCols: Seq[String]): DataFrame =
    storedPartials.unionByName(batchPartials)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("vsum")).as("vsum"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))

  /** Read-time finalization: the user-facing stats, avg derived from the
    * exact components. */
  def finalize(partials: DataFrame): DataFrame =
    partials.select(
      partials.columns.filterNot(
        Set("n", "vsum", "vmin", "vmax")).map(col) ++ Seq(
        col("n"),
        col("vsum").cast("double").as("total"),
        // double-divide the EXACT decimal total: decimal/decimal division
        // scale rules differ across engines, double division is IEEE-fixed
        (col("vsum").cast("double") / col("n")).as("mean"),
        col("vmin"), col("vmax")): _*)
}
