package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EXACT set-similarity join via prefix filtering (the AllPairs/PPJoin
 * family) — the deterministic complement to the probabilistic near-dup
 * paths ([[Dedup.minhashLshPairs]] / [[Dedup.simhashPairs]]): every pair
 * with Jaccard ≥ θ is found, every emitted pair is verified, no sketch, no
 * recall contract to document.
 *
 * Why it scales: a pair with J(A,B) ≥ θ and the length filter
 * θ·max(|A|,|B|) ≤ min(|A|,|B|) must share at least ceil(θ·|X|) tokens
 * with each side X, so the first |X| − ceil(θ·|X|) + 1 tokens of each set
 * — in one GLOBAL token order — must intersect. Ordering tokens
 * rarest-first (by document frequency, ties by token) makes those prefixes
 * the least-shared tokens in the corpus, so the candidate equi-join on
 * prefix tokens explodes nowhere near |corpus|²: hot boilerplate tokens
 * sit at the END of every set and never generate candidates. Cost is
 * Σ_t prefix_count(t)² over prefix tokens only, the standard AllPairs
 * bound, all expressed as hash joins + one per-set window — no crossJoin,
 * no driver loop.
 *
 * θ is taken as a rational `thetaNum/thetaDen` so both the prefix length,
 * the length filter and the final verification are exact integer
 * comparisons — no float threshold drift between engines (the same
 * convention as the q51/q90 libm-free scores).
 */
object SetSimJoin {

  /**
   * All pairs (id_a < id_b) whose DISTINCT-token Jaccard is ≥
   * thetaNum/thetaDen, with the exact `jaccard`. `docs` must carry
   * `idCol` and an array column `toksCol`; duplicates inside a set are
   * collapsed first.
   */
  def prefixJaccardJoin(docs: DataFrame, idCol: String, toksCol: String,
                        thetaNum: Int, thetaDen: Int): DataFrame = {
    require(thetaNum > 0 && thetaDen > 0 && thetaNum <= thetaDen,
      s"theta must be in (0,1]: $thetaNum/$thetaDen")
    val base = docs
      .select(col(idCol).as("id"), array_distinct(col(toksCol)).as("toks"))
      .withColumn("sz", size(col("toks")))
      .filter(col("sz") > 0)

    val tok = base.select(col("id"), col("sz"), explode(col("toks")).as("t"))
    val dfreq = tok.groupBy(col("t")).agg(count(lit(1)).as("df"))

    // rarest-first position of each token inside its set; the prefix is
    // the first sz - ceil(θ·sz) + 1 tokens (integer ceil — no floats)
    val byRarity = Window.partitionBy(col("id")).orderBy(col("df"), col("t"))
    val prefix = tok.join(dfreq, "t")
      .withColumn("pos", row_number().over(byRarity))
      .filter(col("pos") <=
        col("sz") - expr(s"CAST((sz * $thetaNum + ${thetaDen - 1}) DIV $thetaDen AS INT)") + 1)
      .select(col("t"), col("id"), col("sz"), col("pos"))

    // `base` (the tokenization, typically the expensive parent) feeds the
    // token explode AND both verify sides; `prefix` feeds both candidate
    // sides — Spark self-joins recompute shared subplans per side, so both
    // are staged, and the (small) pair result is pinned inside the scope.
    CacheScope.withStages(base, prefix) {
      // candidates: share a prefix token + pass the length filter
      // (J ≥ θ ⇒ min/max ≥ θ, checked as θ·max ≤ 1·min in integers)
      val a = prefix.select(col("t"), col("id").as("id_a"),
        col("sz").as("sz_a"), col("pos").as("pos_a"))
      val b = prefix.select(col("t"), col("id").as("id_b"),
        col("sz").as("sz_b"), col("pos").as("pos_b"))
      // PPJoin positional filter (r6): at the pair's FIRST shared token the
      // achievable overlap is bounded by 1 + min(remaining tokens on each
      // side); a true pair needs α ≥ ceil(θ/(1+θ)·(sz_a+sz_b)), and its
      // first-shared-token row always satisfies the bound (no shared token
      // precedes it), so keeping a pair iff ANY row passes is exact. The
      // filter is row-local (runs inside the join stage, before the
      // distinct() shuffle), which is where the superlinear candidate mass
      // was going at 10× docs — most same-token collisions die here instead
      // of shuffling into dedup + verify.
      val cand = a.join(b, Seq("t"))
        .filter(col("id_a") < col("id_b"))
        .filter(greatest(col("sz_a"), col("sz_b")) * thetaNum <=
          least(col("sz_a"), col("sz_b")) * thetaDen)
        .filter((lit(1) + least(col("sz_a") - col("pos_a"),
            col("sz_b") - col("pos_b"))) * (thetaNum + thetaDen) >=
          (col("sz_a") + col("sz_b")) * thetaNum)
        .select(col("id_a"), col("id_b"))
        .distinct()

      // exact verification on the full sets
      val setsA = base.select(col("id").as("id_a"), col("toks").as("toks_a"),
        col("sz").as("sz_a"))
      val setsB = base.select(col("id").as("id_b"), col("toks").as("toks_b"),
        col("sz").as("sz_b"))
      CacheScope.pin(cand.join(setsA, "id_a").join(setsB, "id_b")
        .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
        .filter(col("inter") * thetaDen >=
          (col("sz_a") + col("sz_b") - col("inter")) * thetaNum)
        .select(col("id_a"), col("id_b"),
          (col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard")))
    }
  }
}
