package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Inter-rater agreement — Cohen's kappa in EXACT integer arithmetic,
 * completing the label-quality family (q187 exact AUC = ranking, q193
 * exact OLS = fit, q199 exact calibration = probability quality; kappa =
 * annotator consistency, the gate a labeling pipeline needs before its
 * labels are trusted for training).
 *
 *   po = Σ_k n_kk / N          (observed agreement)
 *   pe = Σ_k r1_k · r2_k / N²  (chance agreement from the marginals)
 *   κ  = (po − pe) / (1 − pe) = (N·Σn_kk − Σr1_k·r2_k) / (N² − Σr1_k·r2_k)
 *
 * The numerator and denominator are computed in DECIMAL(38,0) — exact
 * integer arithmetic end to end — and PUBLISHED as BIGINT: every
 * sufficient statistic is bounded by N², so BIGINT holds it exactly up
 * to N ≈ 3·10⁹ rated rows; past that, publish the DECIMAL rendered as
 * a string (the documented escape hatch), never as a raw decimal
 * column — engines disagree on how a decimal SURFACES to clients
 * (round 10: Spark parquet delivers Decimal objects, DuckDB converts
 * DECIMAL(38,0) to float64, so `92638` vs `92638.0` hash-missed on
 * numerically identical values). The convenience double is one final
 * division of those exact integers, QUANTIZED to 9 decimals: the raw
 * IEEE quotient is deliberately not on the output surface (round 9 saw
 * DuckDB and Spark differ in the last ulp once N² passed 2^53).
 * Residual risk, disclosed: 9-decimal rounding itself is
 * engine-implemented (Spark HALF_UP on the decimal rendering, DuckDB
 * on the scaled binary), so a quotient within an ulp of a .5e-9
 * boundary could still split — consumers needing bit-certainty
 * re-derive the double from the published exact integers.
 *
 * Spark shape: ONE hash aggregation builds the K×K confusion table
 * (map-side combinable; K² cells of metadata), the marginal products
 * fold over those cells — nothing after the single data scan is
 * row-scale.
 */
object Agreement {

  /** Kappa between two categorical rater columns: one row
    * (n, agree_n, pe_num, kappa_num, kappa_den, kappa). */
  def cohensKappa(df: DataFrame, r1: Column, r2: Column): DataFrame = {
    val d = "decimal(38,0)"
    val cells = df.groupBy(r1.as("a"), r2.as("b"))
      .agg(count(lit(1)).as("n_ab"))
    // K² cells: every aggregate below is metadata-scale
    val m = cells.agg(
      sum(col("n_ab")).cast("long").as("n"),
      coalesce(sum(when(col("a") === col("b"), col("n_ab"))), lit(0L))
        .cast("long").as("agree_n"))
    val r1m = cells.groupBy(col("a")).agg(sum(col("n_ab")).as("r1_k"))
    val r2m = cells.groupBy(col("b")).agg(sum(col("n_ab")).as("r2_k"))
    val pe = r1m.join(r2m, col("a") === col("b"))
      .agg(coalesce(sum(col("r1_k").cast(d) * col("r2_k").cast(d)),
        lit(0).cast(d)).as("pe_num"))
    m.crossJoin(pe)
      .withColumn("kappa_num",
        col("n").cast(d) * col("agree_n").cast(d) - col("pe_num"))
      .withColumn("kappa_den",
        col("n").cast(d) * col("n").cast(d) - col("pe_num"))
      .withColumn("kappa",
        round(col("kappa_num").cast("double") /
          col("kappa_den").cast("double"), 9))
      .select(col("n"), col("agree_n"),
        col("pe_num").cast("long").as("pe_num"),
        col("kappa_num").cast("long").as("kappa_num"),
        col("kappa_den").cast("long").as("kappa_den"), col("kappa"))
  }
}
