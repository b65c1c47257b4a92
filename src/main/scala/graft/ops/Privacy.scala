package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-anonymity auditing (Sweeney 2002): a released table is k-anonymous
 * when every combination of quasi-identifier (QI) values is shared by at
 * least k rows — groups below k are re-identification risks the release
 * process must suppress or generalize. The audit is the measurement step:
 * group sizes over the QI columns, rolled up into risk counts.
 *
 * 100 TB shape: one hash aggregate over the QI key (map-side partial
 * combine does most of the work — QI cardinality ≪ row count by
 * construction), then a second aggregate over the already-tiny group
 * table. No joins, no windows, nothing driver-side.
 */
object Privacy {

  /** One row per distinct QI combination with its `group_size`. */
  def qiGroupSizes(df: DataFrame, qiCols: Seq[String]): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))

  /**
   * Per-`reportCol` k-anonymity report over QI columns `qiCols`
   * (`reportCol` must be one of them): total rows, distinct QI groups,
   * the smallest group (= the attained k-anonymity within that report
   * slice), and how many groups/rows fall below `k`. All-integer.
   */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], reportCol: String,
                      k: Long): DataFrame = {
    require(qiCols.contains(reportCol),
      s"reportCol $reportCol must be a QI column (got $qiCols)")
    qiGroupSizes(df, qiCols)
      .groupBy(col(reportCol))
      .agg(sum(col("group_size")).cast("long").as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("group_size")).as("min_group_size"),
        sum(when(col("group_size") < k, 1L).otherwise(0L)).cast("long")
          .as("n_risky_groups"),
        sum(when(col("group_size") < k, col("group_size")).otherwise(0L))
          .cast("long").as("n_risky_rows"))
  }

  /**
   * Distinct l-diversity audit (Machanavajjhala et al. 2007,
   * "l-Diversity: Privacy Beyond k-Anonymity"): k-anonymity alone fails
   * when a QI group, though large, is HOMOGENEOUS in the sensitive
   * attribute — every member is re-identified to the same secret. A group
   * is l-diverse when the sensitive attribute takes at least `l` distinct
   * values inside it. One row per QI group: size, attained l, and the
   * pass flag. Same 100 TB shape as the k-audit — one hash aggregate over
   * (QI, sensitive) with map-side combine, then one over the group table.
   */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    val qi = qiCols.map(col)
    df.groupBy((qi :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("cnt"))
      .groupBy(qi: _*)
      .agg(sum(col("cnt")).cast("long").as("group_size"),
        count(col(sensitiveCol)).as("l_distinct"))
      .withColumn("diverse", col("l_distinct") >= l)
  }
}
