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

  test("axis bucket of the all-positive query is all bits set") {
    assert(Similarity.axisSignBucketOf(qv, 8, 8) === 255L)
  }
}
