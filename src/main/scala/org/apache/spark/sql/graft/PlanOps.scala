package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation
import org.apache.spark.sql.classic

/**
 * Plan-level helpers that need `private[sql]` access — placed under
 * `org.apache.spark.sql` the way Spark-ecosystem libraries ship their
 * plan hooks. Keep this file tiny: everything else in the engine goes
 * through the public DataFrame/Catalyst API.
 */
object PlanOps {

  /**
   * `df` with every `Repartition`/`RepartitionByExpression` node removed
   * from its logical plan. For side computations whose result is invariant
   * under partitioning (e.g. a row count of a deliberately "spread" input)
   * the exchange is pure cost — stripping it turns the count into a
   * column-pruned scan-only pass.
   */
  def withoutRepartition(df: DataFrame): DataFrame = {
    val stripped = df.queryExecution.logical.transformUp {
      case r: RepartitionOperation => r.child
    }
    classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[classic.SparkSession], stripped)
  }

  /** The analyzed logical plan of `df` (for composing custom nodes). */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan as a DataFrame on `spark`. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Ensure a planner strategy is active on the session — idempotent, so
    * operator entry points can self-install without requiring
    * `spark.sql.extensions` wiring. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession,
                     strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val s = spark.asInstanceOf[classic.SparkSession]
    if (!s.experimental.extraStrategies.contains(strategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ strategy
  }
}
