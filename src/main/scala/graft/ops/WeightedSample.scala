package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic weight-proportional SYSTEMATIC sampling — the
 * training-data mixing primitive ("sample documents proportional to
 * token count") built so the same inputs always select the same rows on
 * any cluster, any partitioning, any retry:
 *
 *   stride S = max(1, totalWeight div target); a row is selected iff the
 *   running weight crosses a stride boundary inside it, i.e.
 *   `(W_before + w) div S  >  W_before div S`.
 *
 * Classic systematic PPS sampling (Madow 1949) with the random phase
 * pinned to 0: every row with w ≥ S is ALWAYS selected (heavy docs can't
 * be missed — the property reservoir sampling lacks), light rows are
 * picked at frequency proportional to their weight, and the selected
 * count is totalWeight div S ± 1. All integer arithmetic.
 *
 * Spark shape: the running weight W_before is the [[TwoPhaseScan]]
 * exclusive prefix sum over the caller's total order — range shuffle +
 * #partitions driver offsets + a PARTITIONED local window. No
 * single-reducer `ORDER BY` window, no driver rows, one data shuffle.
 */
object WeightedSample {

  /**
   * Select ~`target` rows from `df` proportional to long `weightCol`,
   * deterministic under the total order `orderCols`. Adds nothing to
   * the schema; returns the selected subset. Weights must be ≥ 0.
   */
  def systematic(df: DataFrame, weightCol: Column, target: Long,
                 orderCols: Column*): DataFrame = {
    require(target >= 1, s"target must be >= 1: $target")
    val valued = df.withColumn("__w", weightCol.cast("long"))
    TwoPhaseScan.scan(valued, orderCols, sum(col("__w")), _ + _) {
      (parted, offsetsDf, total) =>
        val totalW = total.getOrElse(0L)
        val stride = math.max(1L, totalW / target)
        val local = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, -1)
        CacheScope.pin(parted
          .join(offsetsDf, Seq("__pid"))
          .withColumn("__before",
            coalesce(sum(col("__w")).over(local), lit(0L)) + col("__off"))
          // `div` = exact integer division (Column./ is double division)
          .filter(expr(s"(__before + __w) div ${stride}L > " +
            s"__before div ${stride}L"))
          .drop("__pid", "__w", "__off", "__has_off", "__before"))
    }
  }
}
