package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule (tier-c Catalyst extension, injected via
 * `graft.functions.GraftExtensions`): an EXISTENCE check phrased as
 * "count all matches, compare with zero" —
 *
 *   size(regexp_extract_all(s, p, 0)) > 0      (and the ≥1 / =0 forms)
 *
 * — pays for a full regex scan of the string plus an array allocation per
 * row, when `s RLIKE p` answers the same question with first-match
 * early-exit and no allocation. On a 100 TB text corpus the difference is
 * a whole pass over every byte after the first hit of each row. The
 * rewrite is null-exact: `size` (non-legacy) returns NULL on NULL input,
 * as does RLIKE, and both collapse the same way under a Filter. Under
 * `spark.sql.legacy.sizeOfNull=true` (the non-ANSI default), `size(NULL)`
 * is -1 instead — every zero-comparison is then FALSE, not NULL, which is
 * observable in projection contexts — so the extractor refuses legacy-mode
 * Size nodes entirely (mirroring how Spark's own optimizer rules condition
 * on the flag).
 *
 * Scope is deliberately tight: only group-0 extraction (full-match
 * counting — group extraction could be observed) and only comparisons
 * with the constant zero boundary are touched; everything else is left to
 * the regular optimizer.
 */
object RegexExistenceRewrite extends Rule[LogicalPlan] {

  private object MatchCount {
    /** Matches size(regexp_extract_all(s, p, 0)) — non-legacy Size only,
      * since legacy size(NULL) = -1 breaks null-exactness. */
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Size(RegExpExtractAll(s, p, idx), legacySizeOfNull)
        if !legacySizeOfNull && isZero(idx) => Some((s, p))
      case _ => None
    }
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // n_matches > 0  /  n_matches >= 1  ⟺  rlike
      case GreaterThan(MatchCount(s, p), Literal(0, _)) => RLike(s, p)
      case GreaterThanOrEqual(MatchCount(s, p), Literal(1, _)) => RLike(s, p)
      case LessThan(Literal(0, _), MatchCount(s, p)) => RLike(s, p)
      case LessThanOrEqual(Literal(1, _), MatchCount(s, p)) => RLike(s, p)
      // n_matches = 0  ⟺  NOT rlike (null-exact: both sides NULL on NULL s)
      case EqualTo(MatchCount(s, p), Literal(0, _)) => Not(RLike(s, p))
      case EqualTo(Literal(0, _), MatchCount(s, p)) => Not(RLike(s, p))
    }
}
