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
}
