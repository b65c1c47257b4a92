package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Train/test decontamination: remove from the TRAIN split every document
 * that is a near-duplicate of anything in a protected split (val/test) —
 * the action that follows the q76 contamination AUDIT. Benchmarks leak
 * into training corpora exactly this way, and the fix must delete from
 * train (never from the held-out sets, whose composition is frozen).
 *
 * Composition over machinery: the caller supplies the near-dup pair
 * table (any of the gated engines — MinHash-LSH, SimHash, embedding
 * blocks) and the split assignment; this op is one anti-join: train
 * docs appearing in a cross-(train, protected) pair are dropped. The
 * pair table is sub-quadratic by construction and the anti-join is one
 * shuffle (or a broadcast when the contaminated-id set is small — the
 * usual case, and AQE's call).
 */
object Decontaminate {

  /**
   * Drop every `train` row whose id appears in a near-dup pair with a
   * protected-split id. `pairs` must carry `idA`/`idB` columns over the
   * SAME id space as `docs(idCol)`; `splitOf` maps an id column to its
   * split label; `protectedSplits` defaults to val+test.
   */
  def dropContaminatedTrain(docs: DataFrame, idCol: String,
                            pairs: DataFrame, idA: String, idB: String,
                            splitOf: Column => Column,
                            protectedSplits: Seq[String] = Seq("val", "test"))
      : DataFrame = {
    val sa = splitOf(col(idA))
    val sb = splitOf(col(idB))
    // ids to drop: the TRAIN endpoint of any train×protected pair
    val contaminated = pairs.select(
        when(sa === "train" && sb.isin(protectedSplits: _*), col(idA))
          .when(sb === "train" && sa.isin(protectedSplits: _*), col(idB))
          .as("__contaminated"))
      .filter(col("__contaminated").isNotNull)
      .distinct()
    docs
      .filter(splitOf(col(idCol)) === "train")
      .join(contaminated, col(idCol) === col("__contaminated"), "left_anti")
  }

  /**
   * Audit AND clean from ONE pair table: the contamination matrix (q76's
   * shape — per ordered split-pair counts) and the decontaminated train
   * split (q77's input), computed against the same `pairs` frame. The
   * pair table is the expensive artifact (a full LSH pass over the
   * corpus); running audit then decontaminate as separate pipelines pays
   * it twice, so the production flow is: build pairs once (pinned, per
   * the Dedup contract), call this, release pairs after consuming both
   * outputs. Both returned frames are lazy views over `pairs` — the spec
   * asserts they share the single cached pair stage.
   */
  def auditAndClean(docs: DataFrame, idCol: String,
                    pairs: DataFrame, idA: String, idB: String,
                    splitOf: Column => Column,
                    protectedSplits: Seq[String] = Seq("val", "test"))
      : (DataFrame, DataFrame) = {
    val matrix = pairs
      .withColumn("__sa", splitOf(col(idA)))
      .withColumn("__sb", splitOf(col(idB)))
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
    val cleaned = dropContaminatedTrain(
      docs, idCol, pairs, idA, idB, splitOf, protectedSplits)
    (matrix, cleaned)
  }
}
