package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distribution-drift measurement between two cohorts of one numeric
 * column — the data-drift alarm a corpus warehouse runs between snapshots
 * or sources. The two-sample Kolmogorov-Smirnov statistic is stated in
 * EXACT integer arithmetic: D·n₁·n₂ = max over observed values x of
 * |F₁(x)·n₂ − F₂(x)·n₁| (cross-multiplied empirical CDFs), so the
 * statistic hash-gates across engines; the only double is the final
 * division. The cross products are computed in DECIMAL(38,0) (the repo's
 * exact-integer convention, as in [[CardEst]]/[[Auc]]): with cohort
 * sizes above ~3·10⁹ the product n₁·n₂ overflows int64, so `ks_scaled`
 * is emitted as the decimal's string rendering — exact at any corpus
 * size a 38-digit decimal can count.
 *
 * 100 TB shape: one hash aggregate over (value) with map-side combine,
 * then the cumulative sums over the DISTINCT-value order run through
 * [[TwoPhaseScan.cumSums]] — a continuous value column has ~|rows|
 * distinct values, so the CDF pass is range-partitioned (local running
 * sums + broadcast bucket offsets), never a single-partition window.
 */
object Drift {

  /**
   * The all-pairs KS drift MATRIX over every group of `groupCol`: one
   * row per unordered group pair (g_a < g_b) with (n_a, n_b, ks_scaled,
   * ks) — the monitor a multi-source corpus runs to find the odd crawl
   * out. Build: per-group empirical CDF over the GLOBAL distinct-value
   * grid (groups × values rows, both bounded domains — the group-fill
   * window runs per group, never globally), then one self-equi-join on
   * the value and a max per pair. Everything before the final division
   * is integer.
   */
  def ksDriftMatrix(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val counts = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    // dense (group × value) grid so every group has a CDF point at every
    // observed value: groups × distinct-values rows — domain-bounded
    val grid = counts.select(col("g")).distinct()
      .crossJoin(counts.select(col("v")).distinct())
    val cum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("g"))
    val cdf = grid.join(counts, Seq("g", "v"), "left_outer")
      .withColumn("f", sum(coalesce(col("c"), lit(0L))).over(cum))
      .withColumn("n", sum(coalesce(col("c"), lit(0L))).over(tot))
      .select(col("g"), col("v"), col("f"), col("n"))
    val a = cdf.select(col("g").as("g_a"), col("v"),
      col("f").as("f_a"), col("n").as("n_a"))
    val b = cdf.select(col("g").as("g_b"), col("v"),
      col("f").as("f_b"), col("n").as("n_b"))
    val d = "decimal(38,0)"
    a.join(b, "v")
      .filter(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("f_a").cast(d) * col("n_b") -
          col("f_b").cast(d) * col("n_a"))).cast(d).as("ks_scaled_d"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        col("ks_scaled_d").cast("string").as("ks_scaled"),
        (col("ks_scaled_d").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("ks"))
  }

  /**
   * One row: (n1, n2, ks_scaled, ks) for cohorts `groupA` vs `groupB` of
   * `groupCol`, comparing the distribution of `valueCol`. `ks_scaled` is
   * the exact integer D·n₁·n₂; `ks` the usual statistic in [0, 1].
   */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
              groupA: String, groupB: String): DataFrame = {
    // NULL values carry no distribution information: a null would group
    // into its own row and sort FIRST in the cumulative window, silently
    // skewing every downstream F value — exclude it like the cohorts
    // exclude foreign groups.
    val d = df.filter(col(groupCol).isin(groupA, groupB) &&
        col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol))
    val counts = d.groupBy(col(valueCol))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("c1"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("c2"))
    // cumulative CDFs over the distinct-value order via the range-
    // partitioned two-phase running sum (TwoPhaseScan.cumSums): the value
    // domain of a continuous column is ~|rows| distinct at corpus scale,
    // so a single-partition `ORDER BY value` window here was the one
    // serial chokepoint in the plan — the two-phase scan keeps the exact
    // integer semantics (running sums are associative) at full
    // parallelism, and carries the grand totals (n1, n2) in the same
    // pass instead of a second aggregate branch.
    val cum = TwoPhaseScan.cumSums(counts, Seq(col(valueCol)),
      Seq(("c1", "f1", "n1"), ("c2", "f2", "n2")))
    val dec = "decimal(38,0)"
    cum
      .select(col("n1"), col("n2"),
        abs(col("f1").cast(dec) * col("n2") -
          col("f2").cast(dec) * col("n1")).as("gap"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("gap")).cast(dec).as("ks_scaled_d"))
      .select(col("n1"), col("n2"),
        col("ks_scaled_d").cast("string").as("ks_scaled"),
        (col("ks_scaled_d").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double")))
          .as("ks"))
  }
}
