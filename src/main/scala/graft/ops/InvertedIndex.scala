package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Inverted-index construction over a document corpus: term → (document
 * frequency, total term frequency, the first K postings in (doc, position)
 * order) — the retrieval-side artifact a curation pipeline materializes
 * next to the corpus (BM25 scoring, contamination lookups, keyword audits
 * all read it).
 *
 * Shape: tokenize + posexplode are MAP-ONLY (no shuffle until the
 * postings exist as rows), then ONE hash partitioning on `term` feeds
 * both the stats aggregate and the bounded posting selection — the
 * ranked-postings window and the groupBy share the same key, so Catalyst
 * reuses the exchange rather than shuffling twice.
 *
 * The posting list is BOUNDED (top `postingsK` by (doc_id, pos)): an
 * unbounded `collect_list` per term is the classic inverted-index OOM —
 * a stopword's posting list is the corpus. The rank-filter form
 * (`row_number <= K`) is what Spark 3.5+'s WindowGroupLimit rewrites into
 * a per-partition top-K push-down, so no executor ever buffers a full hot
 * posting list. Full lists belong in a partitioned index WRITE
 * (KeyedPartitionSink), not a query result.
 *
 * Term admission (`minTermLen`, `minDocs`) keeps the index on content
 * terms; the df floor also bounds the q83 gate's output.
 */
object InvertedIndex {

  /** Tokens with 1-based positions, lowercased alpha runs of at least
    * `minTermLen` chars (positions count ALL tokens, so they are stable
    * under admission-threshold changes). */
  private def postings(docs: DataFrame, idCol: String, textCol: String,
                       minTermLen: Int): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "[^a-z]+"),
      t => length(t) > 0)
    docs
      .select(col(idCol), posexplode(toks).as(Seq("pos0", "term")))
      .filter(length(col("term")) >= minTermLen)
      .select(col(idCol), col("term"), (col("pos0") + 1).as("pos"))
  }

  /**
   * The index: one row per admitted term and posting rank ≤ `postingsK`,
   * with per-term stats repeated on each row (a flat gate-friendly layout;
   * the nested-list layout is one `groupBy(term).agg(collect_list)` away
   * for a bounded K).
   */
  def build(docs: DataFrame, idCol: String, textCol: String,
            minTermLen: Int = 7, minDocs: Long = 3,
            postingsK: Int = 3): DataFrame = {
    val post = postings(docs, idCol, textCol, minTermLen)
    val byTerm = Window.partitionBy(col("term"))
      .orderBy(col(idCol), col("pos"))
    val stats = post.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("tf_total"))
      .filter(col("n_docs") >= minDocs)
    post
      .withColumn("post_rank", row_number().over(byTerm))
      .filter(col("post_rank") <= postingsK)
      .join(stats, "term")
      .select(col("term"), col("n_docs"), col("tf_total"),
        col("post_rank"), col(idCol), col("pos"))
  }

  /** BM25-ready doc-length table (|d| in admitted tokens) — the companion
    * side table every scorer over [[build]]'s index needs. */
  def docLengths(docs: DataFrame, idCol: String, textCol: String,
                 minTermLen: Int = 7): DataFrame =
    postings(docs, idCol, textCol, minTermLen)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("doc_len"))

  /** Column helper: admitted-token array for external callers. */
  def admittedTokens(textCol: Column, minTermLen: Int): Column =
    filter(split(lower(textCol), "[^a-z]+"), t => length(t) >= minTermLen)

  /**
   * BM25-shaped top-K retrieval for a LITERAL query — the scorer the
   * inverted index exists for. Deliberate deviation from textbook BM25:
   * the idf factor is the RATIONAL (N − df + 0.5)/(df + 0.5), not its
   * logarithm — `ln` is libm, whose last-ulp behavior differs across
   * engines and would break the cross-engine hash gate (same reason
   * Tfidf uses tf·N/df); the ranking it induces is monotone-equivalent
   * per term. Every score is a fixed sequence of IEEE ops on integers:
   *
   *   avgdl = double(Σdl) / N
   *   idf_t = (double(N) − double(df_t) + 0.5) / (double(df_t) + 0.5)
   *   tfn_t = tf_t·(k1+1) / (tf_t + k1·((1−b) + b·(dl/avgdl)))
   *   score = Σ_t idf_t·tfn_t   — summed in QUERY-TERM ORDER via a
   *           conditional pivot (a groupBy float sum would add in
   *           shuffle order: nondeterministic across engines AND runs).
   *
   * Shape: the token table is staged once (feeds doc lengths and term
   * frequencies); df (|Q| rows) and the (N, Σdl) totals (1 row) are
   * broadcast; the only per-corpus shuffles are the two hash aggregates.
   * Scoring touches only docs containing a query term. Top-K is
   * TakeOrderedAndProject — K winners move, nothing else.
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 20): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "[^a-z]+"),
        t => length(t) > 0)).as("term"))
    CacheScope.withStages(tok) {
      val dl = tok.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
      val totals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val tf = tok.filter(col("term").isin(queryTerms: _*))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
      val idf = (col("n_docs").cast("double") - col("df").cast("double")
        + lit(0.5)) / (col("df").cast("double") + lit(0.5))
      val tfn = col("tf").cast("double") * lit(k1 + 1) /
        (col("tf").cast("double") + lit(k1) *
          (lit(1 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
      val scored = tf
        .join(broadcast(dfreq), "term")
        .join(dl, idCol)
        .crossJoin(broadcast(totals))
        .withColumn("score_t", idf * tfn)
      // fixed-order pivot sum: term i's score lands in slot i, then the
      // slots add left-to-right — deterministic, unlike sum() over rows
      val slots = queryTerms.zipWithIndex.map { case (t, i) =>
        max(when(col("term") === t, col("score_t"))).as(s"__s$i")
      }
      val summed = queryTerms.indices
        .map(i => coalesce(col(s"__s$i"), lit(0.0)))
        .reduceLeft(_ + _)
      CacheScope.pin(scored
        .groupBy(col(idCol))
        .agg(slots.head, slots.tail: _*)
        .withColumn("score", summed)
        .select(col(idCol), col("score"))
        .orderBy(col("score").desc, col(idCol))
        .limit(topK))
    }
  }
}
