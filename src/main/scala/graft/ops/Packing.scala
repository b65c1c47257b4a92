package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Token-budget shard packing — the "cut the corpus into fixed-token
 * training shards" step at the end of every LLM data pipeline: documents
 * take a deterministic total order, and each document is assigned to the
 * shard in which its token interval STARTS (`shard = floor(running_start
 * / budget)` — the streaming-packer rule: shards fill to at least the
 * budget boundary, no document is split, no look-ahead needed).
 *
 * The naive plan is `sum(tokens) OVER (ORDER BY key)` — a global-order
 * window that collapses the table into ONE reducer, the same scale
 * killer [[GlobalIndex]] documents for row numbering. This is the same
 * two-phase fix, for SUMS:
 *
 *   1. range-repartition on the order key + sort within partitions
 *      (sampled bounds → ordered AND balanced partitions);
 *   2. per-partition token totals (no row movement), prefix-summed into
 *      per-partition OFFSETS on the driver (#partitions longs);
 *   3. per-partition exclusive running sum (a PARTITIONED window — safe)
 *      + the broadcast offset = the exact global running start.
 *
 * Equals the naive single-reducer plan row-for-row; the q118 oracle IS
 * that naive plan, in DuckDB.
 */
object Packing {

  /**
   * Assign `shard_id` under `ORDER BY orderCols` (caller makes the order
   * total) so each shard holds consecutive documents whose token
   * intervals start inside one `budget`-sized window. Adds
   * `running_start` (the exclusive global token prefix-sum) and
   * `shard_id`; `tokenCol` must be a non-negative integral count.
   */
  def packByBudget(df: DataFrame, tokenCol: Column, budget: Long,
                   orderCols: Column*): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    val parted = df
      .repartitionByRange(
        spark.sessionState.conf.numShufflePartitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__tok", tokenCol.cast("long"))
    // counts pass and numbering pass must see one row→partition assignment
    CacheScope.withStages(parted) {
      val sums = parted.groupBy(col("__pid"))
        .agg(sum(col("__tok")).as("__s"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val offsets = sums.map(_._1).zip(
        sums.map(_._2).scanLeft(0L)(_ + _).init) // offset_i = Σ tok_<i
      val offsetsDf = spark.createDataFrame(offsets.toSeq)
        .toDF("__pid", "__off")
      val local = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      CacheScope.pin(parted
        .join(broadcast(offsetsDf), Seq("__pid"))
        .withColumn("running_start",
          coalesce(sum(col("__tok")).over(local), lit(0L)) + col("__off"))
        .withColumn("shard_id",
          expr(s"CAST(running_start DIV ${budget}L AS BIGINT)"))
        .drop("__pid", "__off", "__tok"))
    }
  }
}
