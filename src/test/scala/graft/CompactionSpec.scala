package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Compaction

/** Compaction: many tiny files → few target-sized files, same rows; the
  * clustered variant leaves each output file covering a tight key range. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fragmented(): String = {
    val dir = Files.createTempDirectory("graft-compact-in").toString
    // 40 single-row-ish files ≈ the post-ingest accretion pattern
    spark.range(0, 4000).select($"id", ($"id" % 97).cast("double").as("v"))
      .repartition(40)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("compact collapses a fragmented table to the target layout, same rows") {
    val in = fragmented()
    val out = Files.createTempDirectory("graft-compact-out").toString
    val (bytes, nIn) = Compaction.layout(spark, in)
    assert(nIn === 40)
    // target ~half the table per file → 2 output files
    Compaction.compact(spark, in, out, targetBytes = math.max(1L, bytes / 2))
    val (_, nOut) = Compaction.layout(spark, out)
    assert(nOut === 2, s"expected 2 compacted files, got $nOut")
    val a = spark.read.parquet(in).orderBy("id").collect()
    val b = spark.read.parquet(out).orderBy("id").collect()
    assert(a === b)
  }

  test("clusterBy leaves disjoint key ranges per output file") {
    val in = fragmented()
    val out = Files.createTempDirectory("graft-compact-clustered").toString
    val (bytes, _) = Compaction.layout(spark, in)
    Compaction.compact(spark, in, out,
      targetBytes = math.max(1L, bytes / 4), clusterBy = Seq("id"))
    // per-file (min, max) id ranges must not overlap — the property that
    // makes parquet min/max stats prune on id predicates
    val ranges = spark.read.parquet(out)
      .select(input_file_name().as("f"), $"id")
      .groupBy($"f").agg(min($"id").as("lo"), max($"id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"overlapping file ranges: $ranges")
      case _ =>
    }
    assert(spark.read.parquet(out).count() === 4000)
  }
}
