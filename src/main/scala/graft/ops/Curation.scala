package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * The composed corpus-curation pipeline — what the individual
 * training-data ops exist FOR at 100 TB: one pass that takes a raw document
 * table to a clean training corpus.
 *
 *   1. signal pass (embarrassingly parallel, codegen'd): language ID +
 *      quality score per doc;
 *   2. gate: drop unidentifiable-language and low-quality docs;
 *   3. exact dedup: keep the min-id doc per normalized fingerprint;
 *   4. near-dup removal: MinHash-LSH verified pairs (Jaccard ≥ threshold),
 *      drop the higher id of each pair ("keep first" — deterministic, and
 *      the usual practice when exact transitive clustering is not worth a
 *      connected-components pass).
 *
 * Scale shape: one shuffle for the exact-dedup groupBy, the LSH pipeline's
 * banded self-join for near-dups, one anti-join to subtract the losers —
 * nothing quadratic, nothing driver-side.
 */
object Curation {

  /**
   * Returns the curated corpus: (doc_id, lang_pred, quality) of survivors.
   * `minQuality` gates step 2; `nearDupThreshold` feeds the LSH verify.
   */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5,
             nearDupThreshold: Double = 0.5): DataFrame = {
    val id = col(idCol)
    // 1-2. signal + gate
    val scored = docs.select(
      id, col(textCol),
      TextAnalysis.langId(col(textCol)).as("lang_pred"),
      TextAnalysis.qualityScore(col(textCol), "[.,!?;:]").as("quality"))
    // gated feeds three subplans (exact-dedup keepers, the LSH base, the
    // final anti-join) — persist so the signal pass runs once
    val gated = scored
      .filter(col("lang_pred") =!= "und" && col("quality") >= minQuality)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 3. exact dedup — keep min id per fingerprint
    val keepers = gated
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(id).as(idCol))
      .select(idCol)
    val deduped = gated.join(keepers, Seq(idCol), "left_semi")
    // 4. near-dup removal over the exact-deduped survivors
    val losers = Dedup.minhashLshPairs(deduped, idCol, textCol,
        n = 2, threshold = nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct()
    deduped.join(losers, Seq(idCol), "left_anti")
      .select(id, col("lang_pred"), col("quality"))
  }
}
