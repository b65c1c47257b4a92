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
}
