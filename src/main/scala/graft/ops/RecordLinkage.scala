package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Probabilistic record linkage, Fellegi–Sunter style (JASA 1969): decide
 * which record pairs from two dirty sources denote the same real-world
 * entity. The pipeline every entity-resolution system runs:
 *
 *   1. BLOCKING — only pairs agreeing on cheap keys are candidates
 *     (Σ block² candidate bound, the repo's standard pair-engine
 *     discipline — never all-pairs);
 *   2. FIELD COMPARISON — per-field agreement predicates (exact match,
 *     banded numeric, Jaro-Winkler ≥ t via the native codegen'd
 *     [[graft.functions.JaroWinkler]]);
 *   3. SCORING — each field contributes its integer log-likelihood
 *     weight: +w_a when it agrees (log m/u), −w_d when it disagrees
 *     (log (1−m)/(1−u)); the pair's score is the sum;
 *   4. DECISION — two thresholds split match / possible (clerical
 *     review) / non-match.
 *
 * Weights are INTEGER score points (pre-scaled log-likelihood ratios, as
 * production linkers ship them) — the whole decision surface is exact
 * arithmetic; the only doubles are inside the JW comparator, whose
 * DuckDB bit-parity is already gated (q149).
 */
object RecordLinkage {

  /** One field rule: `agree` is a boolean Column over the joined pair
    * frame; agreement adds `wAgree`, disagreement subtracts `wDisagree`
    * (both ≥ 0 — the signs are applied here). */
  final case class FieldRule(name: String, agree: Column,
                             wAgree: Int, wDisagree: Int)

  /**
   * Link `a` × `b` blocked on equal `blockCol` values: emits every
   * candidate pair with its per-field score sum and verdict. Columns of
   * `a` and `b` must be pre-renamed disjoint (the caller's projection
   * defines the pair frame the rules see). Pairs below `tPossible` are
   * dropped (they are the overwhelming mass); `tMatch` splits the rest.
   *
   * SCALE WARNING (measured, r9): a single COARSE block key whose
   * cardinality does not grow with the data (e.g. nation alone — 25
   * blocks forever) makes the candidate mass Σ block² QUADRATIC in
   * table size (59.6× wall at 10× data in the r9 scaling run). Use
   * [[linkPasses]] with several FINE blocking passes instead — the
   * standard production-linkage design (Splink et al.).
   */
  def link(a: DataFrame, b: DataFrame,
           blockColA: Column, blockColB: Column,
           rules: Seq[FieldRule],
           tMatch: Int, tPossible: Int): DataFrame =
    linkPasses(a, b, Seq(blockColA === blockColB), Nil, rules,
      tMatch, tPossible)

  /**
   * MULTI-PASS blocking (union of candidate joins, deduplicated on the
   * id pair): each pass is one equi-joinable condition designed so at
   * least one pass survives each field's dirt — pass recall composes
   * (a pair is a candidate if ANY pass catches it), so every pass can
   * afford a much FINER key than a single-pass design. Fine keys whose
   * cardinality scales with the data (name fragments) keep Σ block²
   * near-linear; pairs missed by EVERY pass are the disclosed recall
   * bound, exactly as in production linkers.
   *
   * `idCols` names the pair-identity columns for the cross-pass dedup
   * (a pair caught by two passes must score once).
   */
  def linkPasses(a: DataFrame, b: DataFrame,
                 passes: Seq[Column], idCols: Seq[String],
                 rules: Seq[FieldRule],
                 tMatch: Int, tPossible: Int): DataFrame = {
    require(passes.nonEmpty, "need at least one blocking pass")
    val candidates = passes.map(cond => a.join(b, cond))
      .reduce((x, y) => x.unionByName(y))
    scorePairs(candidates, passes.size, idCols, rules, tMatch, tPossible)
  }

  /**
   * [[linkPasses]] with the SKEW ADVISOR fronting every blocking join:
   * each pass is an equi key pair (compose multi-field keys with
   * `struct(...)`), joined through [[Skew.advisedJoin]] — blocks past
   * `hotFactor`× the mean frequency are salted over their own bucket
   * count, tolerable blocks join 1:1. Blocking joins are the
   * output-amplification shape AQE cannot see (small shuffle blocks,
   * post-shuffle Σ block² product on one reducer), which is exactly the
   * regime the advisor's round-11 probe measured 3.1× on; default 16× ≈
   * the measured crossover (~2% of the pair mass on one key).
   *
   * WHEN TO USE (measured round 12): on FINE, flat blocking keys — the
   * q202 design — the advisor flags nothing and its extra pass costs
   * 1.6–3.0× the whole plain [[linkPasses]] (sf0.1 customers: 3.13 s vs
   * 1.03 s; 10×: 4.13 s vs 2.65 s), so the gated queries ship the plain
   * form. Reach for this variant when a pass's block distribution can
   * be hot: coarse fallback keys, adversarial/boilerplate values,
   * corpora whose distribution is unknown at author time.
   *
   * Semantics note: a struct key compares null FIELDS as equal (Spark's
   * ordering-based struct equality), so a pass whose raw conjunction
   * would drop null-keyed rows instead blocks them together — a
   * candidate SUPERSET, which only the scoring rules see. With non-null
   * key fields (the common case) the candidates are identical to
   * [[linkPasses]] with the conjunction passes.
   */
  def linkPassesAdvised(a: DataFrame, b: DataFrame,
                        passKeys: Seq[(Column, Column)],
                        idCols: Seq[String], rules: Seq[FieldRule],
                        tMatch: Int, tPossible: Int,
                        hotFactor: Long = 16L): DataFrame = {
    require(passKeys.nonEmpty, "need at least one blocking pass")
    val candidates = passKeys.map { case (ka, kb) =>
      Skew.advisedJoin(a.withColumn("__pk_a", ka),
          b.withColumn("__pk_b", kb), "__pk_a", "__pk_b", hotFactor)
        .drop("__pk_a", "__pk_b")
    }.reduce((x, y) => x.unionByName(y))
    scorePairs(candidates, passKeys.size, idCols, rules, tMatch, tPossible)
  }

  /** Shared pair dedup + Fellegi–Sunter scoring tail. */
  private def scorePairs(candidates: DataFrame, nPasses: Int,
                         idCols: Seq[String], rules: Seq[FieldRule],
                         tMatch: Int, tPossible: Int): DataFrame = {
    require(rules.nonEmpty, "need at least one field rule")
    require(tMatch >= tPossible, "tMatch must be >= tPossible")
    val deduped =
      if (nPasses == 1) candidates
      else {
        require(idCols.nonEmpty,
          "multi-pass blocking needs idCols for the pair dedup")
        // duplicate candidates are byte-identical rows (same a×b pair
        // joined by two passes) — any representative is THE pair
        candidates.dropDuplicates(idCols)
      }
    val score = rules.map(r =>
        when(r.agree, lit(r.wAgree)).otherwise(lit(-r.wDisagree)))
      .reduce(_ + _)
    deduped
      .withColumn("score", score.cast("long"))
      .filter(col("score") >= tPossible)
      .withColumn("verdict",
        when(col("score") >= tMatch, lit("match"))
          .otherwise(lit("possible")))
  }
}
