package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed-table helpers — the co-located-join tier of the 100 TB design:
 * two fact tables bucketed (and sorted) on their join key are read with a
 * matching partitioning, so the join plans as a zero-exchange sort-merge —
 * the shuffle is paid ONCE at write time and amortized over every
 * subsequent join (BucketingSpec asserts the exchange-free plan).
 *
 * This is the storage-layout counterpart of Skew/broadcast: broadcast wins
 * for small dims, bucketing for repeated big-fact⋈big-fact joins, AQE for
 * everything ad hoc.
 */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (idempotent overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Co-located equi-join of two tables bucketed on the same key with the
    * same bucket count: no exchange on either side. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
