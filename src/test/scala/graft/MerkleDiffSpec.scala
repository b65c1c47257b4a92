package graft

import org.apache.spark.sql.functions._

import graft.ops.MerkleDiff

/** Hierarchical table diff: clean ⇒ empty, drops classify as "rows",
  * corruptions as "content", absent buckets surface with zeroed side. */
class MerkleDiffSpec extends SparkSpec {
  import spark.implicits._

  // 4 coarse buckets (k DIV 64) of 4 fine buckets (k DIV 16) each
  private lazy val base = (0L until 256L).map(k => (k, k % 7, s"v$k"))
    .toDF("k", "grp", "payload")

  private def diffOf(dst: org.apache.spark.sql.DataFrame) =
    MerkleDiff.diff(base, dst, expr("k DIV 64"), expr("k DIV 16"),
        Seq(col("k"), col("grp"), col("payload")))
      .orderBy("fb")
      .select("fb", "n_src", "n_dst", "kind")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("identical tables diff to nothing") {
    assert(diffOf(base) === Seq.empty)
  }

  test("a dropped row classifies as 'rows' in exactly its fine bucket") {
    assert(diffOf(base.filter($"k" =!= 100L)) ===
      Seq((6L, 16L, 15L, "rows"))) // 100 DIV 16 = 6
  }

  test("a corrupted payload classifies as 'content' (same counts)") {
    val dst = base.withColumn("payload",
      when($"k" === 200L, lit("tampered")).otherwise($"payload"))
    assert(diffOf(dst) === Seq((12L, 16L, 16L, "content")))
  }

  test("an entire bucket missing on one side surfaces with a zeroed side") {
    assert(diffOf(base.filter($"k" < 192L)) ===
      (12L to 15L).map(fb => (fb, 16L, 0L, "rows")))
  }

  test("drops and corruptions in different subtrees are both found") {
    val dst = base.filter($"k" =!= 5L).withColumn("payload",
      when($"k" === 250L, lit("x")).otherwise($"payload"))
    assert(diffOf(dst) === Seq((0L, 16L, 15L, "rows"),
      (15L, 16L, 16L, "content")))
  }
}
