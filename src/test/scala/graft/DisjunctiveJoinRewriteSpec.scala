package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, Union}
import org.apache.spark.sql.functions._

import graft.plans.DisjunctiveJoinRewrite

/** The disjunctive-join rewrite rule: an inner join on a pure
  * disjunction of cross-side equalities becomes a compensated union of
  * hash joins — BAG-exact (no Distinct required), so every test
  * compares full multiset answers against the vetoed nested-loop plan.
  * The rule is SESSION-DEFAULT (GraftExtensions injects it into the
  * operator-optimization batch — SparkSpec's session carries it), so no
  * test installs anything; the negative controls exclude it per-query
  * via `spark.sql.optimizer.excludedRules`. Veto shapes pinned: outer
  * joins, non-deterministic disjuncts, disjuncts without a cross-side
  * equi key, And-around-Or WITH a top-level hash key, and the
  * MaxDisjuncts cap. And-around-Or WITHOUT a hash key (the
  * cross-side-filter shape) rewrites with the extra conjuncts riding
  * every branch. */
class DisjunctiveJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def unions(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case u: Union => u }.size

  private def joins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  private def nlJoins(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .split('\n').count(_.contains("BroadcastNestedLoopJoin"))

  /** Disable the session-default rule for `body` — the negative control
    * proving what Spark would plan without it. */
  private def withoutRule[A](body: => A): A = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, (prev.toSeq :+ DisjunctiveJoinRewrite.ruleName)
      .mkString(","))
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  // duplicate rows on both sides + a pair matching BOTH disjuncts +
  // a null key on each side: the compensation stress shape
  private lazy val left = Seq(
    (1L, 10L), (1L, 10L), (2L, 20L), (3L, 30L),
    (4L, 99L), (5L, 77L)
  ).toDF("lk", "lv").withColumn("lnull",
    when($"lk" === 5L, lit(null).cast("long")).otherwise($"lk"))

  private lazy val right = Seq(
    (1L, 10L), (2L, 25L), (3L, 30L), (3L, 30L),
    (9L, 99L), (5L, 88L)
  ).toDF("rk", "rv").withColumn("rnull",
    when($"rk" === 5L, lit(null).cast("long")).otherwise($"rk"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("2-disjunct inner OR-join: rewritten to a Union of hash joins " +
      "with NO install call (session-default via GraftExtensions), " +
      "answers (bag, with duplicates and both-disjunct pairs) unchanged") {
    val q = left.join(right, $"lk" === $"rk" || $"lv" === $"rv")
    assert(unions(q) === 1, "no Union in:\n" +
      q.queryExecution.optimizedPlan.treeString)
    assert(joins(q) === 2)
    assert(nlJoins(q) === 0, "nested loop survived:\n" +
      q.queryExecution.executedPlan.toString)
    val expected = withoutRule {
      val ctl = left.join(right, $"lk" === $"rk" || $"lv" === $"rv")
      assert(nlJoins(ctl) === 1, "control plan was not a nested loop")
      sortedRows(ctl)
    }
    assert(sortedRows(q) === expected)
  }

  test("3-disjunct with one disjunct DUPLICATING another: compensation " +
      "keeps the bag exact (no double counting) under count(*)") {
    // lk=rk duplicates lnull=rnull for every non-null key
    val q = left.join(right,
        $"lk" === $"rk" || $"lv" === $"rv" || $"lnull" === $"rnull")
      .groupBy($"lk").agg(count(lit(1)).as("n")).orderBy($"lk")
    assert(unions(q) === 1)
    assert(joins(q) === 3)
    val expected = withoutRule {
      sortedRows(left.join(right,
          $"lk" === $"rk" || $"lv" === $"rv" || $"lnull" === $"rnull")
        .groupBy($"lk").agg(count(lit(1)).as("n")).orderBy($"lk"))
    }
    assert(sortedRows(q) === expected)
  }

  test("null keys: a null disjunct value routes the pair to the other " +
      "branch, never drops or doubles it") {
    val q = left.join(right, $"lnull" === $"rnull" || $"lv" === $"rv")
    val expected = withoutRule {
      sortedRows(left.join(right, $"lnull" === $"rnull" || $"lv" === $"rv"))
    }
    assert(sortedRows(q) === expected)
  }

  test("branch pruning: a Project parent narrows every union branch to " +
      "the referenced columns") {
    val q = left.join(right, $"lk" === $"rk" || $"lv" === $"rv")
      .select($"lk", $"rk")
    val u = q.queryExecution.optimizedPlan
      .collect { case un: Union => un }.head
    assert(u.children.forall(_.output.map(_.name) == Seq("lk", "rk")),
      "branches not pruned to (lk, rk):\n" +
        q.queryExecution.optimizedPlan.treeString)
    val expected = withoutRule {
      sortedRows(left.join(right, $"lk" === $"rk" || $"lv" === $"rv")
        .select($"lk", $"rk"))
    }
    assert(sortedRows(q) === expected)
  }

  test("And-around-Or WITHOUT a top-level hash key (cross-side filter " +
      "merged into the join condition): rewritten, the extra conjunct " +
      "rides every branch as a residual, bag unchanged") {
    val cond = ($"lk" === $"rk" || $"lv" === $"rv") && $"lv" > $"rv" - 100L
    val q = left.join(right, cond)
    assert(unions(q) === 1, "no Union in:\n" +
      q.queryExecution.optimizedPlan.treeString)
    assert(joins(q) === 2)
    assert(nlJoins(q) === 0, "nested loop survived:\n" +
      q.queryExecution.executedPlan.toString)
    val expected = withoutRule {
      val ctl = left.join(right, cond)
      assert(nlJoins(ctl) === 1, "control plan was not a nested loop")
      sortedRows(ctl)
    }
    assert(sortedRows(q) === expected)
  }

  test("And-around-Or filter shape end-to-end: ON (OR) plus a " +
      "cross-side WHERE gives hash-join branches and the same answer") {
    def shape() = left.join(right, $"lk" === $"rk" || $"lv" === $"rv")
      .filter($"lv" =!= $"rv" + 1000L)
      .select($"lk", $"rk")
    val q = shape()
    assert(unions(q) === 1)
    assert(nlJoins(q) === 0)
    val expected = withoutRule(sortedRows(shape()))
    assert(sortedRows(q) === expected)
  }

  test("Filter-parent arms (rule applied directly): a Filter that " +
      "survives above the join is pruned through when its parent is a " +
      "Project, and left unpruned when the grandparent is unknown") {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo,
      GreaterThan, Literal, Or, Rand}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{
      Filter => LFilter, Join => LJoin, JoinHint, Project => LProject,
      Union => LUnion}
    val l = left.queryExecution.analyzed
    val r = right.queryExecution.analyzed
    def att(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
            n: String) = p.output.find(_.name == n).get
    val (lk, lv, rk, rv) = (att(l, "lk"), att(l, "lv"),
      att(r, "rk"), att(r, "rv"))
    val or = Or(EqualTo(lk, rk), EqualTo(lv, rv))
    // a nondeterministic filter is the shape pushdown can never merge
    val ndFilter = GreaterThan(Literal(2.0), Rand(Literal(7L)))
    val j = LJoin(l, r, Inner, Some(or), JoinHint.NONE)

    // Project(lk, rk) over Filter over Join: branches prune to the
    // project's refs ∪ the filter's refs (none here beyond lk, rk)
    val plan = LProject(Seq(lk, rk), LFilter(ndFilter, j))
    val rewritten = DisjunctiveJoinRewrite(plan)
    val u = rewritten.collect { case un: LUnion => un }
    assert(u.nonEmpty, "Filter-under-Project arm did not rewrite:\n" +
      rewritten.treeString)
    assert(u.head.children.forall(
        _.output.map(_.name).toSet == Set("lk", "rk")),
      "branches not pruned through the Filter parent:\n" +
        rewritten.treeString)

    // bare Filter with unknown grandparent: rewritten, NOT pruned (the
    // Filter's output schema must stay its child's)
    val bare = LFilter(ndFilter, j)
    val bareRw = DisjunctiveJoinRewrite(bare)
    val bu = bareRw.collect { case un: LUnion => un }
    assert(bu.nonEmpty, "bare-Filter arm did not rewrite")
    assert(bu.head.output.map(_.name) === j.output.map(_.name),
      "bare-Filter arm changed the Filter's output schema")
  }

  test("LeftSemi OR-join (EXISTS with OR'd keys): rewritten to a union " +
      "of first-matching-disjunct semi/anti chains — hash joins, no " +
      "nested loop, answers (bag, duplicate left rows preserved once " +
      "each) unchanged") {
    val q = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
      "left_semi")
    assert(unions(q) === 1, "no Union in:\n" +
      q.queryExecution.optimizedPlan.treeString)
    // k=2: branch 1 = Semi(d1); branch 2 = Anti(d1) → Semi(d2)
    assert(joins(q) === 3)
    assert(nlJoins(q) === 0, "nested loop survived:\n" +
      q.queryExecution.executedPlan.toString)
    val expected = withoutRule {
      val ctl = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
        "left_semi")
      assert(nlJoins(ctl) === 1, "control plan was not a nested loop")
      sortedRows(ctl)
    }
    assert(sortedRows(q) === expected)
    // the duplicated left row (lk=1) appears exactly twice — semi join
    // preserves left multiplicity, each copy routed to ONE branch
    assert(q.filter($"lk" === 1L).count() === 2L)
  }

  test("LeftSemi with a pair matching BOTH disjuncts: the left row is " +
      "emitted once (first-matching-disjunct routing), never doubled") {
    // (3,30)×(3,30): lk=rk AND lv=rv both true; right has the row twice
    val q = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
      "left_semi")
    assert(q.filter($"lk" === 3L).count() === 1L)
    val expected = withoutRule {
      sortedRows(left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
        "left_semi"))
    }
    assert(sortedRows(q) === expected)
  }

  test("LeftSemi And-around-Or (EXISTS with an OR'd key under a " +
      "cross-side residual): extras ride every chain link") {
    val cond = ($"lk" === $"rk" || $"lv" === $"rv") && $"lv" > $"rv" - 100L
    val q = left.join(right, cond, "left_semi")
    assert(unions(q) === 1)
    assert(nlJoins(q) === 0)
    val expected = withoutRule {
      sortedRows(left.join(right, cond, "left_semi"))
    }
    assert(sortedRows(q) === expected)
  }

  test("LeftAnti OR-join (NOT EXISTS with OR'd keys): rewritten to a " +
      "straight chain of hash anti joins — no Union, no nested loop, " +
      "answers unchanged") {
    val q = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
      "left_anti")
    assert(unions(q) === 0, "anti chain should not union:\n" +
      q.queryExecution.optimizedPlan.treeString)
    assert(joins(q) === 2)
    assert(nlJoins(q) === 0, "nested loop survived:\n" +
      q.queryExecution.executedPlan.toString)
    val expected = withoutRule {
      val ctl = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
        "left_anti")
      assert(nlJoins(ctl) === 1, "control plan was not a nested loop")
      sortedRows(ctl)
    }
    assert(sortedRows(q) === expected)
  }

  test("LeftAnti null keys: a null disjunct value is not-a-match in " +
      "both the chain and the original (bag unchanged)") {
    val q = left.join(right, $"lnull" === $"rnull" || $"lv" === $"rv",
      "left_anti")
    val expected = withoutRule {
      sortedRows(left.join(right,
        $"lnull" === $"rnull" || $"lv" === $"rv", "left_anti"))
    }
    assert(sortedRows(q) === expected)
  }

  test("3-disjunct LeftSemi: k(k+1)/2 chain joins, bag exact") {
    val cond = $"lk" === $"rk" || $"lv" === $"rv" || $"lnull" === $"rnull"
    val q = left.join(right, cond, "left_semi")
    assert(unions(q) === 1)
    assert(joins(q) === 6)
    assert(nlJoins(q) === 0)
    val expected = withoutRule {
      sortedRows(left.join(right, cond, "left_semi"))
    }
    assert(sortedRows(q) === expected)
  }

  test("veto: a nondeterministic expression BELOW the join (duplicated " +
      "subplans would diverge per branch) blocks the rewrite for inner, " +
      "semi and anti") {
    import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, Or,
      Rand}
    import org.apache.spark.sql.catalyst.plans.{Inner => PInner,
      LeftAnti => PAnti, LeftSemi => PSemi}
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin,
      JoinHint, Project => LProject}
    val l = left.queryExecution.analyzed
    val r = right.queryExecution.analyzed
    def att(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
            n: String) = p.output.find(_.name == n).get
    val (lk, lv) = (att(l, "lk"), att(l, "lv"))
    val (rk, rv) = (att(r, "rk"), att(r, "rv"))
    // right subplan computes a rand() column — nondeterministic child
    val ndRight = LProject(r.output :+ Alias(Rand(
      org.apache.spark.sql.catalyst.expressions.Literal(7L)), "nd")(),
      r)
    val or = Or(EqualTo(lk, rk), EqualTo(lv, rv))
    for (jt <- Seq(PInner, PSemi, PAnti)) {
      val j = LJoin(l, ndRight, jt, Some(or), JoinHint.NONE)
      assert(DisjunctiveJoinRewrite(j) eq j,
        s"$jt join over a nondeterministic subplan was rewritten")
    }
    // deterministic control: all three join types rewrite
    for (jt <- Seq(PInner, PSemi, PAnti)) {
      val j = LJoin(l, r, jt, Some(or), JoinHint.NONE)
      assert(!(DisjunctiveJoinRewrite(j) eq j),
        s"deterministic $jt control did not rewrite")
    }
  }

  test("LeftOuter OR-join: rewritten to inner branches + a null-padded " +
      "anti-chain remainder — hash joins only, bag (matched " +
      "multiplicities AND null-padded unmatched rows) unchanged") {
    val q = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
      "left_outer")
    assert(unions(q) === 1, "no Union in:\n" +
      q.queryExecution.optimizedPlan.treeString)
    // k=2: two guarded inner branches + a 2-link anti chain
    assert(joins(q) === 4)
    assert(nlJoins(q) === 0, "nested loop survived:\n" +
      q.queryExecution.executedPlan.toString)
    val expected = withoutRule {
      val ctl = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
        "left_outer")
      assert(nlJoins(ctl) === 1, "control plan was not a nested loop")
      sortedRows(ctl)
    }
    assert(sortedRows(q) === expected)
    // an unmatched left row (no key or value match) survives null-padded
    assert(q.filter($"rk".isNull).count() ===
      withoutRule(left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
        "left_outer").filter($"rk".isNull).count()))
  }

  test("LeftOuter And-around-Or: the extra cross-side conjunct rides " +
      "the inner branches AND every anti-chain link (a row matching the " +
      "keys but failing the residual is null-padded, not dropped)") {
    val cond = ($"lk" === $"rk" || $"lv" === $"rv") && $"lv" > $"rv" - 100L
    val q = left.join(right, cond, "left_outer")
    assert(unions(q) === 1)
    assert(nlJoins(q) === 0)
    val expected = withoutRule {
      sortedRows(left.join(right, cond, "left_outer"))
    }
    assert(sortedRows(q) === expected)
  }

  test("LeftOuter null keys + duplicate left rows: each input copy " +
      "routes once (matched) or pads once (unmatched), bag exact") {
    val q = left.join(right, $"lnull" === $"rnull" || $"lv" === $"rv",
      "left_outer")
    val expected = withoutRule {
      sortedRows(left.join(right,
        $"lnull" === $"rnull" || $"lv" === $"rv", "left_outer"))
    }
    assert(sortedRows(q) === expected)
  }

  test("LeftOuter branch pruning: a Project parent narrows inner AND " +
      "padded branches to the referenced columns") {
    val q = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
        "left_outer")
      .select($"lk", $"rk")
    val u = q.queryExecution.optimizedPlan
      .collect { case un: Union => un }.head
    assert(u.children.forall(_.output.map(_.name) == Seq("lk", "rk")),
      "branches not pruned to (lk, rk):\n" +
        q.queryExecution.optimizedPlan.treeString)
    val expected = withoutRule {
      sortedRows(left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
        "left_outer").select($"lk", $"rk"))
    }
    assert(sortedRows(q) === expected)
  }

  test("FullOuter OR-join: inner branches + BOTH null-padded remainders " +
      "(left anti-chain, mirrored right anti-chain) — hash joins only, " +
      "bag unchanged including both remainder groups") {
    val q = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
      "full_outer")
    assert(unions(q) === 1, "no Union in:\n" +
      q.queryExecution.optimizedPlan.treeString)
    // k=2: two inner branches + two 2-link anti chains
    assert(joins(q) === 6)
    assert(nlJoins(q) === 0, "nested loop survived:\n" +
      q.queryExecution.executedPlan.toString)
    val expected = withoutRule {
      val ctl = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
        "full_outer")
      assert(nlJoins(ctl) === 1, "control plan was not a nested loop")
      sortedRows(ctl)
    }
    assert(sortedRows(q) === expected)
    // both remainder groups present: left-unmatched rows pad rk, the
    // right-only key (rk=9 matches no lk and value 99 pairs lv=99 — so
    // construct via the null-key rows instead) pads lk
    assert(q.filter($"rk".isNull).count() ===
      withoutRule(left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
        "full_outer").filter($"rk".isNull).count()))
    assert(q.filter($"lk".isNull).count() ===
      withoutRule(left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
        "full_outer").filter($"lk".isNull).count()))
  }

  test("FullOuter And-around-Or + null keys: extras ride inner branches " +
      "and both chains; null disjunct values pad, never match") {
    val cond = ($"lnull" === $"rnull" || $"lv" === $"rv") &&
      $"lv" > $"rv" - 100L
    val q = left.join(right, cond, "full_outer")
    assert(unions(q) === 1)
    assert(nlJoins(q) === 0)
    val expected = withoutRule {
      sortedRows(left.join(right, cond, "full_outer"))
    }
    assert(sortedRows(q) === expected)
  }

  test("right outer joins keep their original plan (mirror shape, not " +
      "a corpus shape — the preserved side is written on the left)") {
    val q = left.join(right, $"lk" === $"rk" || $"lv" === $"rv",
      "right_outer")
    assert(unions(q) === 0, "right_outer was rewritten")
    assert(joins(q) === 1)
  }

  test("veto: a non-deterministic disjunct is untouched (defense in " +
      "depth — Spark's analyzer already rejects the shape end-to-end, " +
      "so the rule is exercised directly on a constructed Join)") {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Or, Rand}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin,
      JoinHint}
    val l = left.queryExecution.analyzed
    val r = right.queryExecution.analyzed
    val lk = l.output.find(_.name == "lk").get
    val rk = r.output.find(_.name == "rk").get
    val rv = r.output.find(_.name == "rv").get
    val cond = Or(EqualTo(lk, rk),
      EqualTo(org.apache.spark.sql.catalyst.expressions.Cast(
        Rand(org.apache.spark.sql.catalyst.expressions.Literal(7L)),
        org.apache.spark.sql.types.LongType), rv))
    val j = LJoin(l, r, Inner, Some(cond), JoinHint.NONE)
    assert(DisjunctiveJoinRewrite(j) eq j,
      "nondeterministic disjunct was rewritten")
    // same shape with a deterministic second disjunct DOES rewrite —
    // the guard is the determinism, not the construction
    val detCond = Or(EqualTo(lk, rk), EqualTo(lk, rv))
    val dj = LJoin(l, r, Inner, Some(detCond), JoinHint.NONE)
    assert(!(DisjunctiveJoinRewrite(dj) eq dj),
      "deterministic control did not rewrite")
  }

  test("veto: a disjunct without a cross-side equi key (range predicate) " +
      "keeps the nested loop — it is semantically required") {
    val q = left.join(right, $"lk" === $"rk" || $"lv" > $"rv")
    assert(unions(q) === 0)
    assert(joins(q) === 1)
  }

  test("veto: And-around-Or WITH a top-level hash key — untouched (the " +
      "OR is the hash join's residual, a union would be a pessimization)") {
    val q = left.join(right,
      $"lk" === $"rk" && ($"lv" === $"rv" || $"lv" > $"rv"))
    assert(unions(q) === 0)
    assert(joins(q) === 1)
  }

  test("veto: same-side equality is not a cross-side key") {
    val q = left.join(right, $"lk" === $"rk" || $"lk" === $"lv")
    assert(unions(q) === 0)
  }

  test("cap: more than MaxDisjuncts disjuncts keep the original join") {
    val cond = (0 to DisjunctiveJoinRewrite.MaxDisjuncts)
      .map(i => ($"lk" + lit(i.toLong)) === $"rk")
      .reduce(_ || _)
    val q = left.join(right, cond)
    assert(unions(q) === 0)
  }
}
