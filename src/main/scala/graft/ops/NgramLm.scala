package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed n-gram language-model estimation — the classic corpus
 * by-product a text pipeline ships next to the cleaned data (perplexity
 * filtering, synthetic-data detection, domain scoring all consume one).
 *
 * Bigram interpolated Kneser–Ney with absolute discounting d:
 *
 *   P(w2|w1) = max(c(w1w2) − d, 0)/c(w1·)
 *            + (d·N1+(w1·)/c(w1·)) · (N1+(·w2)/N1+(··))
 *
 * where c(w1·) = Σ_x c(w1 x), N1+(w1·) = |{x : c(w1 x)>0}|,
 * N1+(·w2) = |{x : c(x w2)>0}|, N1+(··) = bigram type count — the
 * continuation-probability backoff that makes KN the standard smoother.
 *
 * Every probability is a FIXED sequence of IEEE ops on exact integer
 * counts (d = 0.75 is binary-exact), so the q91 gate hash-checks real
 * smoothed probabilities across engines — no logs, no order-dependent
 * float summation (the only Σ are integer count aggregations).
 *
 * Shape: one explode → hash aggregate builds the bigram count table
 * (map-side combine does the heavy lifting; the table is |V|²-bounded,
 * tiny next to the corpus); c(w1·)/N1+(w1·) and N1+(·w2) derive from
 * THAT table (grouped scans of |V|² rows, not second corpus passes), and
 * the type total is a 1-row broadcast. Bigrams never cross document
 * boundaries.
 */
object NgramLm {

  private def toks(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z]+"), t => length(t) > 0)

  /** Corpus bigram counts: one row per (w1, w2) with its occurrence
    * count. */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val bi = when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("w1"),
            element_at(t, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    docs.select(explode(bi).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
  }

  /**
   * The smoothed model: (w1, w2, c12, c1, pkn) for every bigram with
   * c12 ≥ `minCount` (the emission floor bounds output, not the counts —
   * the model's denominators always use the FULL table).
   */
  def kneserNeyBigrams(docs: DataFrame, textCol: String,
                       d: Double = 0.75, minCount: Long = 1): DataFrame = {
    val c12 = bigramCounts(docs, textCol)
    CacheScope.withStages(c12) {
      val byW1 = c12.groupBy(col("w1"))
        .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p_w1"))
      val byW2 = c12.groupBy(col("w2"))
        .agg(count(lit(1)).as("n1p_cont"))
      val totals = c12.agg(count(lit(1)).as("n1p_total"))
      val c1d = col("c1").cast("double")
      val pkn = greatest(col("c12").cast("double") - lit(d), lit(0.0)) / c1d +
        (lit(d) * col("n1p_w1").cast("double") / c1d) *
          (col("n1p_cont").cast("double") / col("n1p_total").cast("double"))
      CacheScope.pin(c12
        .filter(col("c12") >= minCount)
        .join(broadcast(byW1), "w1")
        .join(broadcast(byW2), "w2")
        .crossJoin(broadcast(totals))
        .select(col("w1"), col("w2"), col("c12"), col("c1"),
          pkn.as("pkn")))
    }
  }
}
