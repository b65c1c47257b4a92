package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet,
  Coalesce, EqualTo, Expression, Literal, Not, Or}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join,
  LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * DISJUNCTIVE-JOIN rewrite — a custom Catalyst `Rule[LogicalPlan]` that
 * promotes the J4 union-of-equi-joins convention (SURVEY §7.4, built by
 * hand in q05/q217 since round 2) into the optimizer, so ANY user query
 * joining on `k1 = k1' OR k2 = k2'` gets the scale-safe plan without
 * knowing the trick (reference shape: trends.go:357-367 joins
 * status.ust_status_id twice under an OR). Installed SESSION-DEFAULT by
 * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`), so every
 * session built with `spark.sql.extensions=graft.functions.GraftExtensions`
 * carries it; [[install]] remains for bare sessions.
 *
 * Spark plans an inner join whose condition is a pure disjunction as a
 * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, the plan that dies
 * first at 100 TB. But a disjunction of k cross-side equality
 * predicates is a union of k HASH joins, provided double-counting is
 * compensated. This rule rewrites
 *
 *   Join(L, R, Inner, d1 OR d2 OR … OR dk)
 *     ⇒ Union_i Join(L, R, Inner, di AND ¬coalesce(d1, false)
 *                                    AND … AND ¬coalesce(d(i-1), false))
 *
 * Branch i admits a pair iff di is TRUE and every earlier disjunct is
 * NOT TRUE (false or null — exactly the pairs earlier branches did not
 * emit), so each qualifying (l, r) pair appears in EXACTLY ONE branch:
 * the rewrite is BAG-EXACT for any inner join — no Distinct ancestor
 * required, duplicates from duplicate input rows preserved. Each
 * branch's condition carries di's cross-side `EqualTo` as a hash key
 * (ExtractEquiJoinKeys lifts it at planning; the ¬coalesce guards
 * evaluate as the join's residual), so every branch is a shuffled or
 * broadcast HASH join — linear data movement, k scans of each side
 * instead of the nested-loop quadratic.
 *
 * AND-AROUND-OR: a condition `C1 AND … AND (d1 OR … OR dk)` where some
 * OTHER conjunct is already a cross-side equality plans as a hash equi
 * join with the OR as residual — untouched (a union would be a
 * pessimization). But when NO conjunct carries a hash key and exactly
 * the disjunction does (the shape a cross-side filter produces after
 * predicate pushdown merges it into the join condition:
 * `ON (a=b OR c=d) WHERE l.x > r.y`), the same compensation applies
 * with the extra conjuncts riding every branch as residuals:
 *
 *   Join(L, R, Inner, Cs AND (d1 OR … OR dk))
 *     ⇒ Union_i Join(L, R, Inner, di AND guards_i AND Cs)
 *
 * Each pair is still owned by exactly one branch (the d's route it) and
 * is emitted iff it passes all Cs there — bag-exact as before.
 *
 * Fires ONLY when ALL of:
 *  - the join is INNER with a deterministic condition whose top-level
 *    conjuncts contain NO cross-side equality (else the join already
 *    has a hash key) and EXACTLY ONE disjunction-of-predicates conjunct
 *    (2 ≤ k ≤ `MaxDisjuncts`) — outer joins change null-padding
 *    semantics per branch and are vetoed;
 *  - every disjunct is DETERMINISTIC (a nondeterministic predicate
 *    evaluated once per pair cannot be re-evaluated once per branch);
 *  - every disjunct contains at least one conjunct `EqualTo(a, b)` with
 *    `a` referencing only one side and `b` only the other — a disjunct
 *    without a cross-side hash key (e.g. `x > y`) leaves its branch a
 *    nested loop, so the rewrite would gain nothing: vetoed, the
 *    nested loop is then semantically required.
 *
 * Scale note: the branches share the left/right subplans, so the k
 * branches re-scan each side k times (Spark unions do not share
 * subplan results). That is the same cost the handwritten form pays
 * and is linear in the data — the trade this rewrite exists to make.
 */
object DisjunctiveJoinRewrite extends Rule[LogicalPlan] {

  /** Plan-size guard: a 9-way OR is 9 joins — past this, keep the
    * nested loop rather than explode the plan. */
  val MaxDisjuncts = 8

  private def disjuncts(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => disjuncts(l) ++ disjuncts(r)
    case other    => Seq(other)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Is `c` itself a hash-joinable cross-side equality? */
  private def isCrossEqui(c: Expression, left: LogicalPlan,
                          right: LogicalPlan): Boolean = c match {
    case EqualTo(a, b) =>
      val (ar, br) = (a.references, b.references)
      ar.nonEmpty && br.nonEmpty &&
        ((ar.subsetOf(left.outputSet) && br.subsetOf(right.outputSet)) ||
          (br.subsetOf(left.outputSet) && ar.subsetOf(right.outputSet)))
    case _ => false
  }

  /** Does `d` carry a hash-joinable cross-side equality conjunct? */
  private def hasCrossEquiKey(d: Expression, left: LogicalPlan,
                              right: LogicalPlan): Boolean =
    conjuncts(d).exists(isCrossEqui(_, left, right))

  /** TRUE-complement of a possibly-null predicate: rows where `e` is
    * false OR null — the pairs no earlier branch emitted. */
  private def notTrue(e: Expression): Expression =
    Not(Coalesce(Seq(e, Literal.FalseLiteral)))

  /** The compensated union when `j` is eligible, else None. */
  private def rewrite(j: Join): Option[Union] = j match {
    case Join(left, right, Inner, Some(cond), hint) if cond.deterministic =>
      val cs = conjuncts(cond)
      // a top-level cross-side equality means the join already plans as
      // a hash join (the OR, if any, is its residual) — never rewrite
      if (cs.exists(isCrossEqui(_, left, right))) None
      else {
        // the branching disjunction: exactly one conjunct that is an
        // Or of 2..MaxDisjuncts disjuncts, each carrying its own
        // cross-side hash key; everything else rides every branch
        val orIdx = cs.indexWhere { c =>
          val ds = disjuncts(c)
          ds.length >= 2 && ds.length <= MaxDisjuncts &&
            ds.forall(d => hasCrossEquiKey(d, left, right))
        }
        if (orIdx < 0) None
        else {
          val ds = disjuncts(cs(orIdx))
          val extras = cs.patch(orIdx, Nil, 1)
          Some(Union(ds.zipWithIndex.map { case (d, i) =>
            val guards = ds.take(i).map(notTrue)
            Join(left, right, Inner,
              Some((d +: (guards ++ extras)).reduce(And)), hint): LogicalPlan
          }))
        }
      }
    case _ => None
  }

  /** Column-prune each branch to the attributes the PARENT reads: this
    * rule runs inside the operator-optimization batch (extensions) or
    * the user-provided batch ([[install]]) — in the latter nothing
    * re-runs ColumnPruning on the new Union, so without this every
    * branch would shuffle the join's FULL output width through the
    * parent aggregate (measured on q05 at 10×: the unpruned union
    * carried both nation keys through a 60M-row dedup exchange, ~2×
    * the handwritten plan's cost). Branches project the SAME attribute
    * sequence, so the Union's output stays position-aligned and the
    * parent's references resolve against child 0 as before. */
  private def pruned(u: Union, parentRefs: AttributeSet): LogicalPlan = {
    val filtered = u.children.head.output.filter(parentRefs.contains)
    // a pure count(*) parent reads NO columns — keep one rather than
    // unioning zero-width rows
    val kept =
      if (filtered.isEmpty) u.children.head.output.take(1) else filtered
    if (kept.length == u.children.head.output.length) u
    else Union(u.children.map(b =>
      Project(kept, b): LogicalPlan))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // a Filter that SURVIVES above the join here is one pushdown could
    // not merge into it (nondeterministic, or pushdown hasn't reached
    // it yet this pass) — prune through it: the union branches need
    // only the filter's inputs plus whatever ITS parent reads. The
    // Filter's own output schema (= child's) narrows identically, which
    // is safe exactly because the grandparent arm re-establishes the
    // attributes it consumes.
    case p @ Project(_, f @ Filter(_, j: Join)) =>
      rewrite(j).map(u => p.copy(child =
          f.copy(child = pruned(u, p.references ++ f.references))))
        .getOrElse(p)
    case a @ Aggregate(_, _, f @ Filter(_, j: Join), _) =>
      rewrite(j).map(u => a.copy(child =
          f.copy(child = pruned(u, a.references ++ f.references))))
        .getOrElse(a)
    case p @ Project(_, j: Join) =>
      rewrite(j).map(u => p.copy(child = pruned(u, p.references)))
        .getOrElse(p)
    case a @ Aggregate(_, _, j: Join, _) =>
      rewrite(j).map(u => a.copy(child = pruned(u, a.references)))
        .getOrElse(a)
    case f @ Filter(_, j: Join) =>
      // bare Filter with unknown grandparent: the Filter's output is its
      // child's, so pruning would change the schema the grandparent
      // resolved against — rewrite unpruned (width bounded by the
      // join's own output)
      rewrite(j).map(u => f.copy(child = u)).getOrElse(f)
    case j: Join =>
      // unknown parent — rewrite without pruning (still bag-exact;
      // the extra width is bounded by the join's own output)
      rewrite(j).getOrElse(j)
  }

  /** Idempotently install into a BARE session's experimental
    * optimizations (the user-provided batch — pruning and pushdown have
    * already run there). Sessions built with
    * `spark.sql.extensions=graft.functions.GraftExtensions` carry the
    * rule already (operator-optimization batch) and never need this. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(this))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ this
    }
}
