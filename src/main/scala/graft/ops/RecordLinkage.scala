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
   */
  def link(a: DataFrame, b: DataFrame,
           blockColA: Column, blockColB: Column,
           rules: Seq[FieldRule],
           tMatch: Int, tPossible: Int): DataFrame = {
    require(rules.nonEmpty, "need at least one field rule")
    require(tMatch >= tPossible, "tMatch must be >= tPossible")
    val score = rules.map(r =>
        when(r.agree, lit(r.wAgree)).otherwise(lit(-r.wDisagree)))
      .reduce(_ + _)
    a.join(b, blockColA === blockColB)
      .withColumn("score", score.cast("long"))
      .filter(col("score") >= tPossible)
      .withColumn("verdict",
        when(col("score") >= tMatch, lit("match"))
          .otherwise(lit("possible")))
  }
}
