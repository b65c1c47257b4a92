package graft

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.ops.{BucketedAnn, Similarity}

class BucketedAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val qv = Seq.fill(64)(0.1f)

  test("bucketed index scan is partition-pruned to the Hamming ball") {
    val df = BucketedAnn.annTopK(spark, dir, qv, k = 10, maxHamming = 3)
    df.collect() // force planning + execution
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    // the probe is a partition filter, not a data filter …
    assert(scan.partitionFilters.mkString.contains("sign_bucket"))
    // … and it actually prunes: ≤ |ball| = 93 of the 256 bucket directories
    val ball = Similarity.hammingBall(255L, 8, 3)
    assert(scan.relation.partitionSchema.fieldNames.contains("sign_bucket"))
    val selected = scan.metrics("numFiles").value
    val total = spark.read.parquet(BucketedAnn.indexPath(dir))
      .inputFiles.length
    assert(selected < total,
      s"scan read $selected of $total files — no pruning happened")
    assert(ball.length === 93)
  }

  test("bucketed path returns exactly the unbucketed axis-LSH result") {
    val bucketed = BucketedAnn.annTopK(spark, dir, qv, k = 10, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val direct = Similarity.axisLshTopK(
        Tables.embeddings(spark, dir), "vec_id", "embedding", qv,
        k = 10, nPlanes = 8, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(bucketed.toSeq === direct.toSeq)
  }

  test("rotated index: partition-pruned probe, identical to unbucketed rotation") {
    val df = BucketedAnn.rotAnnTopK(spark, dir, qv, k = 10, maxHamming = 3)
    val rows = df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.mkString.contains("sign_bucket"))
    val total = spark.read.parquet(
      BucketedAnn.rotIndexPath(dir)).inputFiles.length
    assert(scan.metrics("numFiles").value < total,
      s"rotated probe read all $total files — no pruning")
    // same rows as the direct (unstored) rotated-LSH path
    val direct = Similarity.rotLshTopK(
        Tables.embeddings(spark, dir), "vec_id", "embedding", qv,
        k = 10, seed = BucketedAnn.RotSeed, nPlanes = 8, maxHamming = 3)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      direct.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("axis bucket of the all-positive query is all bits set") {
    assert(Similarity.axisSignBucketOf(qv, 8, 8) === 255L)
  }

  test("annProbeStats reports the ball size and the pruned candidate count") {
    import org.apache.spark.sql.functions.col
    val stats = BucketedAnn.annProbeStats(spark, dir, qv, maxHamming = 3)
      .collect().head
    assert(stats.getLong(0) === 93L) // |Hamming-3 ball| over 8 planes
    // candidate count == rows of the probed buckets, recomputed independently
    val ball = Similarity.hammingBall(255L, 8, 3).map(_.toInt)
    val expected = spark.read.parquet(BucketedAnn.indexPath(dir))
      .filter(col("sign_bucket").isin(ball: _*)).count()
    assert(stats.getLong(1) === expected)
    assert(stats.getLong(1) < Tables.embeddings(spark, dir).count(),
      "probe did not prune anything")
    // the unbucketed variant sees the same probe cost
    val direct = Similarity.axisLshProbeStats(
      Tables.embeddings(spark, dir), "embedding", qv).collect().head
    assert((direct.getLong(0), direct.getLong(1)) ===
      (stats.getLong(0), stats.getLong(1)))
  }
}
