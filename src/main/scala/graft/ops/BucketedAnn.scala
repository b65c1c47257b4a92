package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * IVF-style bucketed ANN storage: the embeddings table written PARTITIONED
 * BY its axis-sign-LSH bucket, so a query probes a Hamming ball of buckets
 * through parquet PARTITION PRUNING — the scan touches only the probed
 * directories instead of the corpus (Similarity.scala's 100 TB story, now
 * implemented: the `PartitionFilters: [sign_bucket IN (…)]` line in the
 * plan is asserted by BucketedAnnSpec).
 *
 * At cluster scale the index build is a one-off job (one shuffle-free pass
 * adding the bucket column + a partitioned write) and queries are
 * O(corpus / 2^nPlanes · |ball|) scans. Locally the index is cached under
 * java.io.tmpdir keyed by the source dir, built on first use.
 */
object BucketedAnn {

  val NPlanes = 8
  val Dim = 64
  val Stride: Int = Dim / NPlanes

  /** Deterministic local cache path for a source dir's index. */
  def indexPath(dir: String): String = {
    val key = java.lang.Integer.toHexString(dir.hashCode)
    s"${sys.props("java.io.tmpdir")}/graft_ann_index_$key"
  }

  /** Build (once) the bucket-partitioned copy of `embeddings`. */
  def ensureIndex(spark: SparkSession, dir: String): String = {
    val path = indexPath(dir)
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      graft.Tables.embeddings(spark, dir)
        .withColumn("sign_bucket",
          Similarity.axisSignBucket(col("embedding"), NPlanes, Stride).cast("int"))
        .write.mode("overwrite")
        .partitionBy("sign_bucket")
        .parquet(path)
    }
    path
  }

  /** The DataFrame over the bucketed index (sign_bucket is a partition col). */
  def indexed(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(ensureIndex(spark, dir))

  /**
   * ANN top-k over the bucketed index: the Hamming-ball probe becomes a
   * partition-column IN-list, so Catalyst prunes the scan to the probed
   * directories. Result is identical to Similarity.axisLshTopK (same
   * buckets, same exact re-rank) — only the physical plan differs.
   */
  def annTopK(spark: SparkSession, dir: String, queryVec: Seq[Float], k: Int,
              maxHamming: Int = 3): DataFrame = {
    val q = array(queryVec.map(v => lit(v.toDouble)): _*)
    val qBucket = Similarity.axisSignBucketOf(queryVec, NPlanes, Stride)
    val ball = Similarity.hammingBall(qBucket, NPlanes, maxHamming).map(_.toInt)
    indexed(spark, dir)
      .filter(col("sign_bucket").isin(ball: _*))
      .withColumn("cos_sim", Similarity.cosine(col("embedding"), q))
      .select(col("vec_id"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
