package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Blocked string-similarity join: pairs of strings within edit distance
 * `maxDist`, found WITHOUT the all-pairs cross join — candidates are
 * generated only inside blocks that share a cheap key (here: a
 * caller-supplied blocking expression, e.g. the last token, a phonetic
 * code, a length band), then the exact Levenshtein verifies. The
 * canonical entity-resolution shape: O(Σ block²) with small blocks
 * instead of O(N²), and each block co-locates under one shuffle key.
 *
 * Recall contract: a pair is found iff BOTH sides share a block key —
 * the caller's blocking function defines the (documented) recall bound,
 * exactly like LSH banding does for Jaccard (ops/Dedup).
 *
 * NULL strings are dropped up front on both sides: levenshtein(NULL, _)
 * is NULL, so no NULL row can ever satisfy `dist <= maxDist` — but
 * without the filter they all collapse into one shared block key (most
 * blocking expressions, concat_ws included, map NULL to a constant) and
 * self-join there, an O(n_nulls²) block producing zero output.
 */
object StringSim {

  /** Distinct (id_a < id_b) pairs with levenshtein(a, b) ≤ maxDist and
    * equal block keys. Output: id_a, id_b, s_a, s_b, dist. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        blockKey: Column => Column,
                        maxDist: Int): DataFrame = {
    val nonNull = df.filter(col(strCol).isNotNull)
    val a = nonNull.select(col(idCol).as("id_a"), col(strCol).as("s_a"),
      blockKey(col(strCol)).as("__blk"))
    val b = nonNull.select(col(idCol).as("id_b"), col(strCol).as("s_b"),
      blockKey(col(strCol)).as("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .drop("__blk")
  }

  /**
   * Size-capped variant: each natural block is split into deterministic
   * chunks of ≤ `cap` rows (row_number over the id within the block) and
   * the pairwise Levenshtein runs per (block, chunk). Work is O(N·cap) —
   * linear in the corpus with constant `cap` — where the uncapped join is
   * quadratic in the hottest block: one popular blocking key (an empty
   * title, a boilerplate host, a default value) otherwise concentrates
   * O(hot²) comparisons in ONE task, the classic last-straggler OOM.
   *
   * Recall contract (documented, like the banding bound in ops/Dedup and
   * the per-chunk bound of `ngramJaccardPairsChunked`): pairs are found
   * iff both sides land in the same chunk of the same block; cross-chunk
   * pairs inside a hot block are traded away for the bounded per-task
   * candidate count. Blocks of ≤ `cap` rows are a single chunk, so on
   * well-blocked data the output equals `editDistancePairs` exactly.
   *
   * 100 TB shape: one window shuffle on the block key to assign chunks,
   * then a self-join keyed by (block, chunk) whose per-key row count is
   * capped — no skew, no quadratic blowup.
   */
  def editDistancePairsChunked(df: DataFrame, idCol: String, strCol: String,
                               blockKey: Column => Column,
                               maxDist: Int, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("__nat")).orderBy(col("__id"))
    val keyed = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        blockKey(col(strCol)).as("__nat"))
      .withColumn("__chunk", floor((row_number().over(w) - 1) / cap))
      .withColumn("__blk", concat(col("__nat"), lit("_"), col("__chunk")))
      .select(col("__blk"), col("__id"), col("__s"))
    val a = keyed.select(col("__blk"), col("__id").as("id_a"),
      col("__s").as("s_a"))
    val b = keyed.select(col("__blk"), col("__id").as("id_b"),
      col("__s").as("s_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .drop("__blk")
  }
}
