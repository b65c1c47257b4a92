package graft

import graft.ops.PageRank

/** The fixed-point PageRank op (q166's engine): exact parity with an
  * independent in-memory reference on random graphs, plus structural
  * invariants (symmetry, teleport floor). */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Naive single-machine reference: identical integer arithmetic
    * (pr DIV outdeg per edge, (85·s) DIV 100 + teleport), maps and
    * loops instead of joins and aggregates. */
  private def reference(pairs: Seq[(Long, Long)],
                        k: Int): Map[Long, (Long, Long)] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var pr = deg.map { case (n, _) => n -> PageRank.Scale }
    for (_ <- 1 to k) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = in.map { case (n, s) => n -> (150000000000L + 85L * s / 100L) }
    }
    pr.map { case (n, p) => n -> (deg(n), p) }
  }

  private def run(pairs: Seq[(Long, Long)], k: Int): Map[Long, (Long, Long)] =
    PageRank.fixedPoint(pairs.toDF("id_a", "id_b"), k)
      .as[(Long, Long, Long)].collect()
      .map { case (id, d, p) => id -> (d, p) }.toMap

  test("path graph a-b-c: ends symmetric, center dominates, exact values") {
    val got = run(Seq((1L, 2L), (2L, 3L)), k = 3)
    assert(got === reference(Seq((1L, 2L), (2L, 3L)), 3))
    assert(got(1L) === got(3L), "symmetric ends must tie exactly")
    assert(got(2L)._2 > got(1L)._2, "the center outranks the fringe")
  }

  test("random graph ≡ in-memory reference for k = 1, 2, 3") {
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 120).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    for (k <- 1 to 3)
      assert(run(pairs, k) === reference(pairs, k), s"k = $k")
  }

  test("every rank respects the teleport floor") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)), k = 3)
    assert(got.values.forall(_._2 >= 150000000000L))
  }
}
