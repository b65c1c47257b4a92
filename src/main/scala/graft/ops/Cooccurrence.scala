package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Document-level term co-occurrence with PMI-style association scoring —
 * the collocation/related-terms primitive behind query expansion and
 * taxonomy mining. SET-based (does X appear in the same document as Y),
 * the complement of [[NgramLm]]'s SEQUENTIAL bigram statistics.
 *
 * Scoring follows the engine's libm-free discipline: PMI is
 * log(N·n_xy / (n_x·n_y)), and log is monotone, so ranking by the exact
 * rational N·n_xy / (n_x·n_y) ranks identically — numerator and
 * denominator are exact BIGINT products and the emitted score is ONE IEEE
 * division, bit-reproducible across engines (no log, no float
 * accumulation).
 *
 * Scale shape: the quadratic step is per-document pair expansion of the
 * FILTERED vocabulary (min term length + per-doc distinct), O(Σ v_d²) for
 * v_d = qualifying terms per doc — the admission filter is the bound, the
 * same way q25 bounds its block pairs. Everything after is two hash
 * aggregates and a broadcast of the 1-row corpus size.
 */
object Cooccurrence {

  /**
   * Pairs (t1 < t2) of qualifying terms (length ≥ `minTermLen`,
   * lowercased alpha runs) co-occurring in ≥ `minPairDocs` documents,
   * with doc frequencies and the rational association score
   * `N·n_xy / (n_x·n_y)`.
   */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
               minTermLen: Int, minPairDocs: Int): DataFrame = {
    val terms = docs.select(col(idCol).as("id"),
        explode(array_distinct(filter(
          split(lower(col(textCol)), "[^a-z]+"),
          t => length(t) >= minTermLen))).as("term"))
    CacheScope.withStages(terms) {
      val n = docs.select(count(lit(1)).as("n_docs"))
      val dfreq = terms.groupBy(col("term")).agg(count(lit(1)).as("n_t"))
      val pairs = terms.select(col("id"), col("term").as("t1"))
        .join(terms.select(col("id"), col("term").as("t2")), Seq("id"))
        .filter(col("t1") < col("t2"))
        .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_xy"))
        .filter(col("n_xy") >= minPairDocs)
      CacheScope.pin(pairs
        .join(dfreq.select(col("term").as("t1"), col("n_t").as("n_x")), "t1")
        .join(dfreq.select(col("term").as("t2"), col("n_t").as("n_y")), "t2")
        .crossJoin(broadcast(n))
        .select(col("t1"), col("t2"), col("n_xy"), col("n_x"), col("n_y"),
          ((col("n_docs") * col("n_xy")).cast("double") /
            (col("n_x") * col("n_y"))).as("score")))
    }
  }
}
