package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers encoding SQL semantics Spark's bare join API doesn't. */
object Joins {

  /**
   * SQL-faithful NOT IN as an anti join (SURVEY §7.4 trap #1): plain
   * `left_anti` keeps left rows whose key is NULL and ignores NULL keys on
   * the right, but SQL `x NOT IN (subquery)` excludes NULL-keyed left rows
   * and returns ZERO rows if the subquery yields any NULL.
   *
   * Catalyst's own NOT-IN rewrite is the anti-join condition
   * `k = r OR isnull(k = r)` — the isnull leg is true when either side is
   * NULL, which reproduces both three-valued-logic behaviors. The OR makes
   * this a nested-loop join, so the right side should be small (it is a
   * deleted-members key list in the reference — trends.go:313-320); for a
   * big right side, pre-aggregate `any(key IS NULL)` instead.
   */
  def notInFaithful(left: DataFrame, right: DataFrame,
                    leftKey: Column, rightKey: Column): DataFrame =
    left.join(broadcast(right),
      leftKey === rightKey || (leftKey === rightKey).isNull,
      "left_anti")
}
