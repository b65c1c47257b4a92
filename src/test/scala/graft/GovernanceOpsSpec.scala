package graft

import org.apache.spark.sql.functions._

import graft.ops.{Cluster, FeatureHash, Privacy}

/** Edges for the governance-tier ops: k-anonymity boundary at exactly k,
  * feature-hash slot/sign determinism + exact integer accumulation, and
  * the two-hop census on hand-built graphs (path, triangle, star). */
class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityAudit: groups at exactly k are safe, k-1 are risky") {
    // seg A: one group of 3 (risky at k=3? no: >= k), one group of 2 (risky)
    val df = Seq(
      ("A", 1), ("A", 1), ("A", 1), // group size 3 == k -> safe
      ("A", 2), ("A", 2),           // size 2 < 3 -> risky
      ("B", 9)                      // size 1 -> risky
    ).toDF("seg", "qi")
    val got = Privacy.kAnonymityAudit(df, Seq("seg", "qi"), "seg", k = 3L)
      .orderBy("seg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(
      ("A", 5L, 2L, 2L, 1L, 2L),
      ("B", 1L, 1L, 1L, 1L, 1L)))
  }

  test("kAnonymityAudit rejects a report column outside the QI set") {
    val df = Seq(("A", 1)).toDF("seg", "qi")
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(df, Seq("qi"), "seg", 2L)
    }
  }

  test("hashedGroupVectors: same token always lands in one signed slot; tf accumulates") {
    val df = Seq(("g", "alpha alpha alpha"), ("g", "alpha")).toDF("src", "text")
    val row = FeatureHash.hashedGroupVectors(df, "src", "text", dim = 8)
      .collect().head
    val slots = (0 until 8).map(j => row.getAs[Long](s"s$j"))
    // 4 occurrences of one token -> exactly one slot at ±4, rest 0
    assert(slots.count(_ != 0L) === 1)
    assert(math.abs(slots.find(_ != 0L).get) === 4L)
  }

  test("hashedGroupVectors matches a hand-rolled md5 reference") {
    val words = Seq("key", "agg", "row", "scan", "slow", "key")
    val df = Seq(("g", words.mkString(" "))).toDF("src", "text")
    val dim = 16
    val got = FeatureHash.hashedGroupVectors(df, "src", "text", dim)
      .collect().head
    val want = Array.fill(dim)(0L)
    words.foreach { w =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(6)
        .foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      val s = if ((md / dim) % 2 == 0) 1L else -1L
      want((md % dim).toInt) += s
    }
    assert((0 until dim).map(j => got.getAs[Long](s"s$j")) === want.toSeq)
  }

  test("cosineMatrix: identical groups give 1.0, orthogonal give 0.0") {
    val rows = Seq(
      ("a", 3L, 0L), ("b", 5L, 0L), // parallel
      ("c", 0L, 2L))                // orthogonal to both
    val vecs = rows.toDF("g", "s0", "s1")
    val got = FeatureHash.cosineMatrix(vecs, "g", dim = 2)
      .orderBy("g_a", "g_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq(("a", "b", 1.0), ("a", "c", 0.0), ("b", "c", 0.0)))
  }

  test("twoHopCensus on a path a-b-c-d: ends reach 1+1, middles 2+1") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Cluster.twoHopCensus(pairs, "id_a", "id_b")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 2L, 1L),
      (4L, 1L, 1L)))
  }

  test("twoHopCensus on a triangle: every node n1=2, n2=0") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Cluster.twoHopCensus(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((2L, 0L)))
  }

  test("twoHopCensus on a star: hub sees all leaves at 1, leaves see each other at 2") {
    val pairs = (2L to 6L).map(l => (1L, l)).toDF("id_a", "id_b")
    val got = Cluster.twoHopCensus(pairs, "id_a", "id_b")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.head === ((1L, 5L, 0L)))
    assert(got.tail.forall { case (_, n1, n2) => n1 == 1L && n2 == 4L })
  }
}
