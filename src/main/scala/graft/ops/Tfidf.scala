package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * TF-IDF term scoring over a document corpus — the classic relevance /
 * keyword-extraction primitive (salient-term indexing, near-dup triage,
 * topic drift monitoring in a training-data pipeline).
 *
 * Scale shape: tokenize+explode is map-only; term frequency is one shuffle
 * on (doc, term) with map-side partials; document frequency is one
 * aggregate over the (already small) tf table. The corpus size N rides a
 * broadcast one-row aggregate (the established q14/J-pattern). Top-k per
 * document is a window row_number — bounded by k, partitioned by doc.
 *
 * Determinism: the score is tf·N/df computed as
 * `CAST(tf·N AS DOUBLE) / df` — one exact integer product (< 2^53) and
 * ONE IEEE double division, bit-identical in any engine; the usual
 * log-idf variant would hash-diverge on libm differences, and ranking is
 * order-isomorphic either way (log is monotone in N/df).
 */
object Tfidf {

  /** Lowercased ASCII-letter tokens of length ≥ `minLen`. The regex class
    * `[^a-z]+` lives in the Java∩RE2 subset, and the `[a-z]` survivor
    * alphabet makes `lower()` locale-proof (ASCII folding only). */
  def tokens(df: DataFrame, idCol: String, textCol: String,
             minLen: Int): DataFrame =
    df.select(col(idCol),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("term"))
      .filter(length(col("term")) >= minLen)

  /** Top-`k` terms per document by tf·N/df (ties → term asc).
    * Output: id, term, tf, df, score, rank. */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int, minLen: Int = 4): DataFrame = {
    val tf = tokens(df, idCol, textCol, minLen)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // `tf` feeds BOTH the document-frequency aggregate and the join probe
    // — stage it (CacheScope) or the tokenize+explode+aggregate runs
    // twice; result pinned, caller owns the release (≤ k rows per doc)
    CacheScope.withStages(tf) {
      val dfreq = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df")) // tf rows are distinct (doc, term)
      val n = df.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("score").desc, col("term"))
      CacheScope.pin(tf.join(dfreq, Seq("term"))
        .crossJoin(broadcast(n)) // one-row broadcast: corpus size
        .withColumn("score",
          (col("tf") * col("n_docs")).cast("double") / col("df"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col(idCol), col("term"), col("tf"), col("df"),
          col("score"), col("rank")))
    }
  }
}
