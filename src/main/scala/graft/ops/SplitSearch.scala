package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Decision-tree split search — the inner loop of distributed gradient
 * boosting / random forests: for every candidate threshold t of an ordinal
 * feature, the class counts of the induced left (feature ≤ t) and right
 * partitions, plus the weighted-Gini ranking components, all in EXACT
 * integer arithmetic.
 *
 * Shape: the table-sized work is ONE hash aggregate over the feature's
 * value domain (map-side partial combine collapses rows to ≤ NDV(feature)
 * partials per task); the prefix sums that turn per-value counts into
 * per-threshold partition counts run on that already-collapsed table, so
 * the window is candidate-set-sized, not data-sized — the same two-phase
 * discipline as the equi-depth histogram (q173).
 *
 * Ranking without floats: minimizing weighted Gini
 *   n_l·(1 − Σᵢ(cₗᵢ/n_l)²) + n_r·(1 − Σᵢ(cᵣᵢ/n_r)²)
 * is equivalent to maximizing
 *   S(t) = (Σᵢcₗᵢ²·n_r + Σᵢcᵣᵢ²·n_l) / (n_l·n_r),
 * so the table carries S's numerator and denominator as DECIMAL(38,0) —
 * exact at any corpus size a 38-digit integer covers — and a consumer
 * picks argmax S by cross-multiplied comparison. No IEEE division
 * anywhere in the contract.
 */
object SplitSearch {

  /**
   * Binary-label split-evaluation table over an integer-valued feature.
   * One row per candidate threshold (every distinct feature value except
   * the maximum — its right side is empty): threshold, left/right sizes
   * and positive counts, and the exact Gini-ranking fraction
   * (`gini_num`, `gini_den`). Ordered by threshold.
   */
  def giniSplitTable(df: DataFrame, featureCol: String,
                     labelCol: String): DataFrame = {
    val perValue = df
      .select(col(featureCol).cast("long").as("v"),
        when(col(labelCol), 1L).otherwise(0L).as("pos"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n_v"), sum(col("pos")).as("pos_v"))

    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perValue
      .withColumn("n_l", sum(col("n_v")).over(w))
      .withColumn("pos_l", sum(col("pos_v")).over(w))

    val totals = perValue.agg(
      sum(col("n_v")).as("n"), sum(col("pos_v")).as("pos"))

    val d = "decimal(38,0)"
    cum.crossJoin(broadcast(totals))
      .filter(col("n_l") < col("n")) // max value: right side empty
      .select(col("v").as("threshold"),
        col("n_l"), col("pos_l"),
        (col("n") - col("n_l")).as("n_r"),
        (col("pos") - col("pos_l")).as("pos_r"))
      .withColumn("neg_l", col("n_l") - col("pos_l"))
      .withColumn("neg_r", col("n_r") - col("pos_r"))
      .select(col("threshold"), col("n_l"), col("pos_l"), col("n_r"), col("pos_r"),
        ((col("pos_l").cast(d) * col("pos_l") + col("neg_l").cast(d) * col("neg_l"))
            * col("n_r")
          + (col("pos_r").cast(d) * col("pos_r") + col("neg_r").cast(d) * col("neg_r"))
            * col("n_l")).cast(d).as("gini_num"),
        (col("n_l").cast(d) * col("n_r")).cast(d).as("gini_den"))
  }
}
