package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge training (Sennrich et al. '16) over a
 * (symbol-sequence, frequency) vocabulary — the tokenizer-training step
 * of an LLM data pipeline, structured for scale: the corpus appears in
 * exactly ONE hash aggregate (word → frequency, done by the caller);
 * every merge round after that touches only vocabulary rows (bounded by
 * the language's word inventory, not the corpus), with one single-row
 * driver fetch per round (the argmax pair — the q82 bounded-collect
 * pattern).
 *
 * Merge semantics are the standard leftmost-non-overlapping application:
 * scanning a word's symbols left to right, every adjacent (a, b)
 * occurrence merges unless its left symbol was itself just consumed
 * ("aaa" + merge(a,a) → ["aa", "a"]). [[applyMerge]] states that scan as
 * an exact array fold; BpeSpec pins it against an in-process reference
 * and q151's oracle reaches the same result via two delimiter-sentinel
 * string-replace passes.
 */
object Bpe {

  /** Leftmost-non-overlapping application of merge (a, b) → a+b to a
    * symbol-array column: an `aggregate` fold — if the accumulated
    * tail is `a` and the incoming symbol is `b`, replace the tail with
    * the merged symbol, else append. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Adjacent symbol pairs of one round, frequency-weighted:
    * (a, b, cnt). Guards the descending-sequence trap for 1-symbol
    * words. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"),
        explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
          .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /**
   * Run `k` merge rounds over `vocab` (columns `syms: array<string>`,
   * `freq: long`): per round, the most frequent pair (ties to the
   * lexicographically smallest) merges into the vocabulary. Returns the
   * merge table (step, sym_a, sym_b, pair_count). The caller should
   * persist `vocab` — each round's pair count re-scans it.
   */
  def mergeRounds(vocab: DataFrame, k: Int): Seq[(Int, String, String, Long)] = {
    var v = vocab
    val winners = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to k) {
      val top = pairCounts(v)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        winners += ((step, a, b, cnt))
        v = v.select(applyMerge(col("syms"), a, b).as("syms"), col("freq"))
      }
    }
    winners.result()
  }
}
