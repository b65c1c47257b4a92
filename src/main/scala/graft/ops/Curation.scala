package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The composed corpus-curation pipeline — what the individual
 * training-data ops exist FOR at 100 TB: one pass that takes a raw document
 * table to a clean training corpus.
 *
 *   1. signal pass (embarrassingly parallel, codegen'd): language ID +
 *      quality score per doc;
 *   2. gate: drop unidentifiable-language and low-quality docs;
 *   3. exact dedup: keep the min-id doc per normalized fingerprint;
 *   4. near-dup removal: MinHash-LSH verified pairs (Jaccard ≥ threshold).
 *      Default mode drops the higher id of each PAIR ("keep first" —
 *      deterministic, cheap); `transitive = true` instead closes over the
 *      pair graph (Cluster.connectedComponents) and keeps exactly the
 *      min-id doc of each duplicate CLUSTER — for a doc C similar to both
 *      A and B (A≁B), pair mode keeps {A, B}, transitive mode keeps {A}.
 *
 * Scale shape: one shuffle for the exact-dedup groupBy, the LSH pipeline's
 * banded self-join for near-dups, one anti-join to subtract the losers —
 * nothing quadratic, nothing driver-side.
 */
object Curation {

  /**
   * Returns the curated corpus: (doc_id, lang_pred, quality) of survivors,
   * pinned in cache (caller owns the `unpersist()` — CacheScope contract).
   * `minQuality` gates step 2; `nearDupThreshold` feeds the LSH verify.
   */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5,
             nearDupThreshold: Double = 0.5,
             transitive: Boolean = false,
             lshBands: Int = 16): DataFrame =
    curateImpl(docs, idCol, textCol, minQuality, nearDupThreshold,
      transitive, lshBands, wantStats = false)._1

  /**
   * [[curate]] plus per-stage observability: the second frame is one row
   * of survivor counts (n_input, n_gated, n_exact_deduped, n_survivors) —
   * "no silent caps": every drop the pipeline makes is a number an
   * operator can chart and alert on. The counts come from the staged
   * frames the pipeline materializes anyway, so they are near-free.
   */
  def curateWithStats(docs: DataFrame, idCol: String, textCol: String,
                      minQuality: Double = 0.5,
                      nearDupThreshold: Double = 0.5,
                      transitive: Boolean = false,
                      lshBands: Int = 16): (DataFrame, DataFrame) = {
    val (result, stats) = curateImpl(docs, idCol, textCol, minQuality,
      nearDupThreshold, transitive, lshBands, wantStats = true)
    (result, stats.get)
  }

  /** The shared pipeline. `wantStats = false` (the [[curate]] path) skips
    * the four stage-count jobs entirely — the counts exist for the
    * observability caller (q40), and a caller that only wants the
    * survivors should not pay a corpus-sized n_input scan plus three
    * cached-stage counts for a frame it throws away. */
  private def curateImpl(docs: DataFrame, idCol: String, textCol: String,
                         minQuality: Double,
                         nearDupThreshold: Double,
                         transitive: Boolean,
                         lshBands: Int,
                         wantStats: Boolean): (DataFrame, Option[DataFrame]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val id = col(idCol)
    // 1-2. signal + gate
    val scored = docs.select(
      id, col(textCol),
      TextAnalysis.langId(col(textCol)).as("lang_pred"),
      TextAnalysis.qualityScore(col(textCol), "[.,!?;:]").as("quality"))
    val gated = scored
      .filter(col("lang_pred") =!= "und" && col("quality") >= minQuality)
    // 3. exact dedup — keep min id per fingerprint
    val keepers = gated
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(id).as(idCol))
      .select(idCol)
    val deduped = gated.join(keepers, Seq(idCol), "left_semi")
    // gated feeds three subplans (exact-dedup keepers, the LSH base, the
    // final anti-join) and deduped feeds two — stage both so the signal
    // pass and the semi-join run once, released after the result is pinned
    CacheScope.withStages(gated, deduped) {
      // 4. near-dup removal over the exact-deduped survivors; the LSH
      // result arrives pinned — release it once the survivors are pinned
      val pairs = Dedup.minhashLshPairs(deduped, idCol, textCol,
        n = 2, bands = lshBands, threshold = nearDupThreshold)
      try {
        // transitive mode: close over the pair graph and drop every doc
        // that is not the min of its component; cc arrives pinned and is
        // released once the survivors are pinned (the losers anti-join
        // below reads its warm blocks)
        val cc = if (transitive)
          Some(Cluster.connectedComponents(pairs, "id_a", "id_b"))
        else None
        val losers = cc match {
          case Some(c) => c.filter(col("node") =!= col("component"))
            .select(col("node").as(idCol))
          case None => pairs.select(col("id_b").as(idCol)).distinct()
        }
        val result = CacheScope.pin(
          deduped.join(losers, Seq(idCol), "left_anti")
            .select(id, col("lang_pred"), col("quality")))
        // counts read warm caches (gated/deduped staged, result pinned).
        // n_input counts the input PRE-exchange: callers hand us a
        // deliberately repartitioned ("spread") frame, and a row count is
        // invariant under partitioning — stripping the Repartition makes
        // this a column-pruned scan-only pass instead of scan + shuffle
        val stats = if (!wantStats) None else {
          val nInput =
            org.apache.spark.sql.graft.PlanOps.withoutRepartition(docs).count()
          Some(Seq((nInput, gated.count(), deduped.count(),
              result.count()))
            .toDF("n_input", "n_gated", "n_exact_deduped", "n_survivors"))
        }
        cc.foreach(_.unpersist(blocking = false))
        (result, stats)
      } finally pairs.unpersist(blocking = false)
    }
  }
}
