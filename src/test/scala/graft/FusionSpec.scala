package graft

import graft.ops.{Chunking, Fusion}
import org.apache.spark.sql.functions._

/** RRF fusion edges: rank assignment with score ties, reciprocal-sum
  * arithmetic, the rank-0 sentinel for single-list docs, and the fused
  * ordering; plus the FIM splitter's exact split points, passthrough
  * rule, and lossless reassembly. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rankByScore: desc by score, ties pinned by id asc") {
    val df = Seq((3L, 0.5), (1L, 0.9), (2L, 0.5)).toDF("id", "score")
    val got = Fusion.rankByScore(df, "id", "score")
      .select($"id", $"rank").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("rrfFuse: both-list doc sums both reciprocals, single-list docs get sentinel 0") {
    val a = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    val b = Seq((10L, 2L), (30L, 1L)).toDF("id", "rank")
    val got = Fusion.rrfFuse(a, b, "id", k = 60, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val both = 1.0 / 61.0 + 1.0 / 62.0
    assert(got.head === ((10L, 1L, 2L, both)))
    assert(got.map(t => (t._1, t._2, t._3)).toSet ===
      Set((10L, 1L, 2L), (20L, 2L, 0L), (30L, 0L, 1L)))
    // absent list contributes exactly 0.0, not 1/(60+0)
    val only20 = got.find(_._1 == 20L).get
    assert(only20._4 === 1.0 / 62.0)
  }

  test("rrfFuse: equal scores order by id; topN truncates") {
    // two docs each in exactly one list at rank 1 -> identical rrf
    val a = Seq((5L, 1L)).toDF("id", "rank")
    val b = Seq((2L, 1L)).toDF("id", "rank")
    val ids = Fusion.rrfFuse(a, b, "id", 60, 1).collect().map(_.getLong(0))
    assert(ids.toSeq === Seq(2L))
  }

  test("fimSplit: exact split points and lossless reassembly") {
    val df = Seq((1L, "a b c d e f g h i")).toDF("id", "text") // nw = 9
    val r = Chunking.fimSplit(df, "text").collect().head
    // p = 4, m = 2
    assert(r.getAs[Seq[String]]("prefix_w") === Seq("a", "b", "c", "d"))
    assert(r.getAs[Seq[String]]("middle_w") === Seq("e", "f"))
    assert(r.getAs[Seq[String]]("suffix_w") === Seq("g", "h", "i"))
    assert(r.getAs[Boolean]("is_fim"))
    assert(r.getAs[Long]("nw") === 9L)
  }

  test("fimSplit: docs under minWords pass through whole") {
    val df = Seq((1L, "a b c"), (2L, "")).toDF("id", "text")
    val rows = Chunking.fimSplit(df, "text").orderBy("id").collect()
    assert(!rows(0).getAs[Boolean]("is_fim"))
    assert(rows(0).getAs[Seq[String]]("prefix_w") === Seq("a", "b", "c"))
    assert(rows(0).getAs[Seq[String]]("middle_w") === Seq.empty)
    assert(rows(1).getAs[Long]("nw") === 0L)
  }

  test("fimSplit: boundary nw = 4 splits 2/1/1; preserves pass-through columns") {
    val df = Seq(("src0", 1L, "w x y z")).toDF("source", "id", "text")
    val r = Chunking.fimSplit(df, "text").collect().head
    assert(r.getAs[String]("source") === "src0")
    assert(r.getAs[Seq[String]]("prefix_w") === Seq("w", "x"))
    assert(r.getAs[Seq[String]]("middle_w") === Seq("y"))
    assert(r.getAs[Seq[String]]("suffix_w") === Seq("z"))
  }

  test("fimSplit reassembly equals original words for every doc") {
    val rnd = new scala.util.Random(5)
    val docs = (1L to 50L).map(i =>
      (i, Seq.fill(rnd.nextInt(12))("w" + rnd.nextInt(9)).mkString(" ")))
      .toDF("id", "text")
    val bad = Chunking.fimSplit(docs, "text")
      .withColumn("joined",
        concat(col("prefix_w"), col("middle_w"), col("suffix_w")))
      .join(docs, "id")
      .filter(not(col("joined") <=>
        graft.ops.TextAnalysis.words(col("text"))))
      .count()
    assert(bad === 0L)
  }
}
