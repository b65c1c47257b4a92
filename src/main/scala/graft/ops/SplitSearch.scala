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
 * per-threshold partition counts run on that already-collapsed table —
 * and since NDV of a continuous feature is ~|rows|, they run through the
 * range-partitioned [[TwoPhaseScan.cumSums]], never a single-partition
 * window (the multi-feature variant below partitions per feature
 * instead, which is parallel as soon as there are many features).
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
   * The feature is cast to long with Spark's TRUNCATION-toward-zero
   * semantics — SQL twins must say `CAST(trunc(x) AS BIGINT)`, since a
   * bare `CAST(x AS BIGINT)` ROUNDS in DuckDB and diverges on any
   * non-integral value.
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

    // Prefix sums + totals over the candidate order via the range-
    // partitioned two-phase running sum (TwoPhaseScan.cumSums): a
    // continuous feature has ~|rows| distinct values at corpus scale, so
    // the previous single-partition `ORDER BY v` window was the plan's one
    // serial chokepoint. cumSums keeps the exact integer semantics at full
    // parallelism and carries the grand totals (n, pos) in the same pass —
    // still no separate totals re-scan of the table.
    val cum = TwoPhaseScan.cumSums(perValue, Seq(col("v")),
      Seq(("n_v", "n_l", "n"), ("pos_v", "pos_l", "pos")))

    val d = "decimal(38,0)"
    cum
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

  /**
   * ALL-features split search in one table pass — the actual gradient-
   * boosting inner loop: the per-row cost of evaluating F features is one
   * F-way stack (an in-row array + posexplode-free explode, no exchange),
   * and ONE hash aggregate over (feature, value) collapses the table to
   * Σ NDV(feature) rows before any window runs. The prefix sums and
   * totals are then per-feature (`PARTITION BY feature`), so no global
   * single-partition window exists at any feature count — each feature's
   * candidate set is its own window partition.
   *
   * `features` maps feature name → integer-valued expression (bin or
   * cast upstream); label as in [[giniSplitTable]]. Output adds the
   * leading `feature` column; same exact DECIMAL(38,0) ranking fraction.
   */
  def giniSplitTableMulti(df: DataFrame, features: Seq[(String, org.apache.spark.sql.Column)],
                          labelCol: String): DataFrame = {
    require(features.nonEmpty)
    val stacked = df.select(
        explode(array(features.map { case (n, c) =>
          struct(lit(n).as("feature"), c.cast("long").as("v")) }: _*)).as("s"),
        when(col(labelCol), 1L).otherwise(0L).as("pos"))
      .select(col("s.feature").as("feature"), col("s.v").as("v"), col("pos"))

    val perValue = stacked.groupBy(col("feature"), col("v"))
      .agg(count(lit(1)).as("n_v"), sum(col("pos")).as("pos_v"))

    // Totals per feature = the running sums' last value over the same
    // partitioning (see giniSplitTable): one exchange, one sort, no
    // totals join, no second pass over the stacked table.
    val w = Window.partitionBy(col("feature")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("feature")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = perValue
      .withColumn("n_l", sum(col("n_v")).over(w))
      .withColumn("pos_l", sum(col("pos_v")).over(w))
      .withColumn("n", max(col("n_l")).over(wAll))
      .withColumn("pos", max(col("pos_l")).over(wAll))

    val d = "decimal(38,0)"
    cum
      .filter(col("n_l") < col("n"))
      .select(col("feature"), col("v").as("threshold"),
        col("n_l"), col("pos_l"),
        (col("n") - col("n_l")).as("n_r"),
        (col("pos") - col("pos_l")).as("pos_r"))
      .withColumn("neg_l", col("n_l") - col("pos_l"))
      .withColumn("neg_r", col("n_r") - col("pos_r"))
      .select(col("feature"), col("threshold"), col("n_l"), col("pos_l"),
        col("n_r"), col("pos_r"),
        ((col("pos_l").cast(d) * col("pos_l") + col("neg_l").cast(d) * col("neg_l"))
            * col("n_r")
          + (col("pos_r").cast(d) * col("pos_r") + col("neg_r").cast(d) * col("neg_r"))
            * col("n_l")).cast(d).as("gini_num"),
        (col("n_l").cast(d) * col("n_r")).cast(d).as("gini_den"))
  }
}
