package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EXACT set-CONTAINMENT join via asymmetric prefix filtering — the
 * "is this document mostly a subset of another" complement to
 * [[SetSimJoin.prefixJaccardJoin]]. Jaccard misses subset duplication (a
 * paragraph pasted into a much longer page has tiny J but containment ≈ 1);
 * the training-data dedup literature treats the two as separate passes.
 *
 * Contract: all unordered pairs (id_a < id_b) with
 * `|A∩B| / min(|A|,|B|) ≥ thetaNum/thetaDen`, the overlap coefficient
 * (Szymkiewicz–Simpson). Every comparison is exact integer arithmetic —
 * no float thresholds.
 *
 * Why it scales, and why it differs from the Jaccard join: containment has
 * NO length filter (a 10-gram snippet may live inside a 10⁵-gram page), so
 * the only recall-lossless prune is the pigeonhole prefix on the SMALLER
 * side: if |A∩B| ≥ ceil(θ·m) where m = min(|A|,|B|), then ANY
 * m − ceil(θ·m) + 1 tokens of the smaller set must include one shared
 * token. Hence the candidate join is PREFIX(smaller) ⋈ ALL-tokens(larger) —
 * asymmetric, unlike the prefix×prefix join of the Jaccard case. Tokens are
 * ordered rarest-first globally (df, ties by token) so prefixes hold the
 * corpus's least-shared tokens; the index side carries each token's
 * positional rank too, which enables the PPJoin-style positional bound
 * `1 + min(|A|−pos_a, |B|−pos_b) ≥ ceil(θ·m)` — exact for the pair's FIRST
 * shared token (no shared token precedes it on either side, both sides
 * being ranked in the same global order), so keep-if-any-row-passes loses
 * nothing. Cost is Σ_t prefix_count(t)·token_count(t) over prefix tokens,
 * all hash joins + one per-set window — no crossJoin, no driver loop.
 */
object ContainmentJoin {

  /** TOTAL TOKENS (Σ sz over all sets) below which the verify stage
    * broadcasts the token sets instead of shuffling them to every
    * candidate pair. Token-based, not doc-based: per-doc arrays are
    * unbounded, so a row-count bound would blindly broadcast a corpus of
    * few huge documents. 2²⁵ longs ≈ 256 MB serialized per broadcast
    * (the plan builds one relation per join side), comfortably inside
    * executor memory while covering every gate-scale corpus. */
  val BroadcastTokenLimit: Long = 1L << 25

  /**
   * All pairs (id_a < id_b) whose DISTINCT-token overlap coefficient is
   * ≥ thetaNum/thetaDen, with sizes, exact intersection and the one
   * final-division `containment` double. `docs` must carry `idCol` and an
   * array column `toksCol`; duplicates inside a set are collapsed first.
   */
  def prefixContainmentJoin(docs: DataFrame, idCol: String, toksCol: String,
                            thetaNum: Int, thetaDen: Int): DataFrame = {
    require(thetaNum > 0 && thetaDen > 0 && thetaNum <= thetaDen,
      s"theta must be in (0,1]: $thetaNum/$thetaDen")
    // sorted-distinct once per set: the verify stage's intersection runs
    // as the native two-pointer merge (sorted_intersect_size) instead of
    // a per-pair hash set — the pair count, not the set size, is the big
    // number in that stage
    val base = docs
      .select(col(idCol).as("id"),
        sort_array(array_distinct(col(toksCol))).as("toks"))
      .withColumn("sz", size(col("toks")))
      .filter(col("sz") > 0)

    val tok = base.select(col("id"), col("sz"), explode(col("toks")).as("t"))
    val dfreq = tok.groupBy(col("t")).agg(count(lit(1)).as("df"))

    // rarest-first rank of each token inside its set; ceil(θ·sz) in integers
    val byRarity = Window.partitionBy(col("id")).orderBy(col("df"), col("t"))
    val ranked = tok.join(dfreq, "t")
      .withColumn("pos", row_number().over(byRarity))
      .select(col("t"), col("id"), col("sz"), col("pos"))

    CacheScope.withStages(base, ranked) {
      // probe side: the pigeonhole prefix (first sz − ceil(θ·sz) + 1 tokens)
      val probe = ranked
        .filter(col("pos") <= col("sz") -
          expr(s"CAST((sz * $thetaNum + ${thetaDen - 1}) DIV $thetaDen AS INT)") + 1)
        .select(col("t"), col("id").as("id_p"), col("sz").as("sz_p"),
          col("pos").as("pos_p"))
      // index side: EVERY token (the larger set exposes its full inventory)
      val index = ranked.select(col("t"), col("id").as("id_i"),
        col("sz").as("sz_i"), col("pos").as("pos_i"))

      // a valid pair's smaller side must fire as the probe; equal sizes fire
      // both ways and the normalized distinct collapses them
      val candRaw = probe.join(index, Seq("t"))
        .filter(col("id_p") =!= col("id_i") && col("sz_p") <= col("sz_i"))
        .filter((lit(1) + least(col("sz_p") - col("pos_p"),
            col("sz_i") - col("pos_i"))) * thetaDen >=
          col("sz_p") * thetaNum)
        .select(least(col("id_p"), col("id_i")).as("id_a"),
          greatest(col("id_p"), col("id_i")).as("id_b"))

      // exact verification on the full sets: inter·den ≥ num·min(sz).
      // The candidate pair list is the BIG side of these joins (on dense
      // vocabularies it approaches all-pairs — measured 8.3M pairs for
      // 5k docs), so the plan branches on whether the SET TABLE fits a
      // broadcast (token-sum bound — see BroadcastTokenLimit):
      //  - broadcastable: verify runs MAP-SIDE over the RAW candidate
      //    stream (duplicate hits included — the per-row merge is cheaper
      //    than the 10⁷-entry pre-distinct hash aggregate it replaces),
      //    and only the tiny survivor set is deduplicated;
      //  - past the bound (corpus-scale token mass): candidates are
      //    de-duplicated FIRST so the two shuffle joins move each pair
      //    once.
      val small = base.agg(coalesce(sum(col("sz")), lit(0L)))
        .head.getLong(0) <= BroadcastTokenLimit
      val maybeBroadcast: DataFrame => DataFrame =
        if (small) broadcast else identity
      val cand = if (small) candRaw else candRaw.distinct()
      val setsA = maybeBroadcast(base.select(col("id").as("id_a"),
        col("toks").as("toks_a"), col("sz").as("sz_a")))
      val setsB = maybeBroadcast(base.select(col("id").as("id_b"),
        col("toks").as("toks_b"), col("sz").as("sz_b")))
      // int/long token sets verify through the native two-pointer merge;
      // other element types (e.g. raw string shingles) fall back to the
      // builtin hash-set intersect
      import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
      val inter = base.schema("toks").dataType match {
        case ArrayType(IntegerType | LongType, _) =>
          Dedup.intersectSize(col("toks_a"), col("toks_b"))
        case _ => size(array_intersect(col("toks_a"), col("toks_b")))
      }
      val verified = cand.join(setsA, "id_a").join(setsB, "id_b")
        .withColumn("inter", inter)
        .filter(col("inter") * thetaDen >=
          least(col("sz_a"), col("sz_b")) * thetaNum)
        .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
          col("inter"),
          (col("inter").cast("double") /
            least(col("sz_a"), col("sz_b"))).as("containment"))
      CacheScope.pin(if (small) verified.distinct() else verified)
    }
  }
}
