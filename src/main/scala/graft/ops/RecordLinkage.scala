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
   * Cost (round-13 revision of the round-12 measurement): the always-on
   * exact advisor measured 1.6–3.0× the whole plain [[linkPasses]] on
   * q202's fine flat keys — so round 12 parked it. [[Skew.maybeHot]]'s
   * sketch pre-verdict now fronts every [[Skew.advisedJoin]]: a
   * certified-flat pass takes the PLAIN equi join (identical plan, one
   * cheap width-bounded sketch pass extra), and only a
   * possibly-hot pass pays the exact advisor + salting. That makes this
   * variant safe as the default for corpora whose block distribution is
   * unknown at author time — the q202 gate ships through it.
   *
   * Null semantics (round-13 advice item): a struct key compares null
   * FIELDS as equal (Spark's ordering-based struct equality), so a raw
   * struct-blocked join would admit candidate pairs a conjunction pass
   * `ka_f1 = kb_f1 AND ka_f2 = kb_f2` drops — and extra candidates that
   * clear `tPossible` would reach the OUTPUT. The derived key columns
   * are therefore null-FIELD-filtered (recursively) before the join:
   * candidates — and hence output — are exactly [[linkPasses]]'s with
   * the equivalent conjunction passes.
   */
  def linkPassesAdvised(a: DataFrame, b: DataFrame,
                        passKeys: Seq[(Column, Column)],
                        idCols: Seq[String], rules: Seq[FieldRule],
                        tMatch: Int, tPossible: Int,
                        hotFactor: Long = 16L): DataFrame = {
    require(passKeys.nonEmpty, "need at least one blocking pass")
    // ONE sketch job pre-verdicts every pass's key distribution (the
    // per-pass sketch would re-scan `a` once per pass); a certified-flat
    // pass takes the plain equi join, a possibly-hot one the exact
    // advisor + salting. The sketch sees the pre-null-filter keys — a
    // candidate-superset view, which can only push a verdict toward
    // "maybe hot" (runs the exact advisor unnecessarily), never toward
    // an unsound skip.
    val allKeys = passKeys.zipWithIndex.foldLeft(a) {
      case (acc, ((ka, _), i)) => acc.withColumn(s"__pk_$i", ka)
    }
    val hot = Skew.maybeHotKeys(allKeys,
      passKeys.indices.map(i => s"__pk_$i"), hotFactor)
    val candidates = passKeys.zip(hot).map { case ((ka, kb), isHot) =>
      val ka2 = a.withColumn("__pk_a", ka)
      val kb2 = b.withColumn("__pk_b", kb)
      val fa = ka2.filter(noNullFields(ka2, "__pk_a"))
      val fb = kb2.filter(noNullFields(kb2, "__pk_b"))
      (if (isHot)
        Skew.advisedJoin(fa, fb, "__pk_a", "__pk_b", hotFactor,
          joinType = "inner", preVerdict = false)
      else fa.join(fb, col("__pk_a") === col("__pk_b")))
        .drop("__pk_a", "__pk_b")
    }.reduce((x, y) => x.unionByName(y))
    scorePairs(candidates, passKeys.size, idCols, rules, tMatch, tPossible)
  }

  /** TRUE iff `colName` and every (recursively) nested struct field is
    * non-null — the equality semantics of the conjunction form of a
    * composite blocking key. */
  private def noNullFields(df: DataFrame, colName: String): Column = {
    def rec(path: String,
            dt: org.apache.spark.sql.types.DataType): Column = dt match {
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.map(f => rec(s"$path.${f.name}", f.dataType))
          .foldLeft(col(path).isNotNull)(_ && _)
      case _ => col(path).isNotNull
    }
    rec(colName, df.schema(colName).dataType)
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
