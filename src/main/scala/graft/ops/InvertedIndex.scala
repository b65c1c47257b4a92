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
}
