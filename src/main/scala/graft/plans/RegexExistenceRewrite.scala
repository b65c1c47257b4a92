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
 * as does RLIKE, and both collapse the same way under a Filter.
 *
 * Scope is deliberately tight: only group-0 extraction (full-match
 * counting — group extraction could be observed) and only comparisons
 * with the constant zero boundary are touched; everything else is left to
 * the regular optimizer.
 */
object RegexExistenceRewrite extends Rule[LogicalPlan] {

  private object MatchCount {
    /** Matches size(regexp_extract_all(s, p, 0)), yielding (s, p). */
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Size(RegExpExtractAll(s, p, idx), _) if isZero(idx) => Some((s, p))
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
