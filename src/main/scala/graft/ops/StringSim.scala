package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
 */
object StringSim {

  /** Distinct (id_a < id_b) pairs with levenshtein(a, b) ≤ maxDist and
    * equal block keys. Output: id_a, id_b, s_a, s_b, dist. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        blockKey: Column => Column,
                        maxDist: Int): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(strCol).as("s_a"),
      blockKey(col(strCol)).as("__blk"))
    val b = df.select(col(idCol).as("id_b"), col(strCol).as("s_b"),
      blockKey(col(strCol)).as("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .drop("__blk")
  }
}
