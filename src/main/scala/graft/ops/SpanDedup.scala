package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Exact shared-span detection — the substring-granularity dedup tier
 * (the "Deduplicating Training Data Makes Language Models Better" signal):
 * two documents sharing a VERBATIM run of `spanLen` tokens are partial
 * copies even when their full-document similarity is below every near-dup
 * threshold (quote farms, stitched articles, template+content pages).
 *
 * Pipeline (all linear except the last, which is frequency-capped):
 *  1. slide a `spanLen`-token window over each doc (map-only array ops),
 *     one row per DISTINCT (doc, span-hash) — the 64-bit span hash, not
 *     the span text, is what shuffles;
 *  2. span frequency census; spans in `[minDocs, maxDocs]` docs are
 *     IDENTIFYING — rarer is noise, commoner is boilerplate that belongs
 *     to the [[Cleaning.boilerplateLines]] dictionary, not to pairing
 *     (and would otherwise explode quadratically: a span in f docs yields
 *     f² pairs, so the cap bounds per-span work at maxDocs²);
 *  3. self-join admitted spans → doc pairs with their shared-span count.
 *
 * Grouping on xxhash64 of the span admits a 2⁻⁶⁴ per-pair collision false
 * positive — the standard content-address trade, same as every
 * fingerprinting tier here; the q87 oracle groups on the span TEXT and
 * the gate passing is the collision-freeness witness at test scale.
 */
object SpanDedup {

  /** Lowercased alpha-run tokens. */
  private def toks(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z]+"), t => length(t) > 0)

  /** One row per distinct (doc, span-hash): the sliding windows.
    * Short docs (< spanLen tokens) contribute nothing — the `when` guard
    * also dodges Spark's descending `sequence(1, n)` for n < 1.
    * The per-doc dedup happens MAP-SIDE (`array_distinct` on the hash
    * array before explode): the alternative — a row-level `.distinct()`
    * after explode — shuffles every span OCCURRENCE on (doc, hash), a
    * full-width exchange this stage doesn't need (it cost q87 half its
    * 10×-docs wall in SCALING_r6). */
  def docSpans(docs: DataFrame, idCol: String, textCol: String,
               spanLen: Int): DataFrame = {
    val t = toks(col(textCol))
    val spans = when(size(t) >= spanLen,
        transform(sequence(lit(1), size(t) - (spanLen - 1)),
          i => concat_ws(" ", slice(t, i, lit(spanLen)))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol),
      explode(array_distinct(transform(spans, s => xxhash64(s))))
        .as("span_hash"))
  }

  /**
   * Doc pairs (id_a < id_b) sharing ≥ 1 identifying span, with the count
   * of shared spans — ordered output is the caller's business. The span
   * table feeds three subplans (census + both self-join sides), so it is
   * CacheScope-staged: tokenize/slide/hash runs once, and the pinned pair
   * result (small by the frequency cap) is what the caller releases.
   */
  def sharedSpanPairs(docs: DataFrame, idCol: String, textCol: String,
                      spanLen: Int = 12, minDocs: Long = 2,
                      maxDocs: Long = 20): DataFrame = {
    val sp = docSpans(docs, idCol, textCol, spanLen)
    CacheScope.withStages(sp) {
      val admitted = sp.groupBy(col("span_hash"))
        .agg(count(lit(1)).as("__n_docs"))
        .filter(col("__n_docs").between(minDocs, maxDocs))
        .select(col("span_hash"))
      val keyed = sp.join(admitted, "span_hash")
      val a = keyed.select(col("span_hash"), col(idCol).as("id_a"))
      val b = keyed.select(col("span_hash"), col(idCol).as("id_b"))
      CacheScope.pin(
        a.join(b, Seq("span_hash"))
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("n_spans")))
    }
  }
}
