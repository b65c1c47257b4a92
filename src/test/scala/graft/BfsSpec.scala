package graft

import org.apache.spark.sql.functions._

import graft.ops.Bfs

/** Multi-source BFS: minimum hop semantics, the hop cap, seed handling. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  // path 1-2-3-4-5, triangle 1-6-7-1, isolated edge 8-9; undirected
  private lazy val pairs = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (1L, 6L), (6L, 7L), (7L, 1L),
    (8L, 9L)).toDF("id_a", "id_b")

  private def run(seeds: Seq[Long], maxHops: Int): Map[Long, Long] =
    Bfs.hopDistances(pairs, seeds.toDF("id"), maxHops)
      .as[(Long, Long)].collect().toMap

  test("min-hop distances from one seed; unreachable nodes absent") {
    val d = run(Seq(1L), maxHops = 4)
    // 6 and 7 are both 1 hop via the triangle (7 via the direct 7-1
    // edge, NOT 2 hops through 6)
    assert(d === Map(1L -> 0L, 2L -> 1L, 6L -> 1L, 7L -> 1L,
      3L -> 2L, 4L -> 3L, 5L -> 4L))
    assert(!d.contains(8L) && !d.contains(9L))
  }

  test("hop cap truncates, never mislabels") {
    val d = run(Seq(1L), maxHops = 2)
    assert(d === Map(1L -> 0L, 2L -> 1L, 6L -> 1L, 7L -> 1L, 3L -> 2L))
  }

  test("multi-source takes the minimum over seeds; duplicate seeds dedup") {
    val d = run(Seq(1L, 5L, 5L), maxHops = 2)
    // 3 is 2 hops from either end, 4 is 1 hop from seed 5
    assert(d(3L) === 2L && d(4L) === 1L && d(5L) === 0L)
  }

  test("a seed with no edges still surfaces at distance 0") {
    val d = run(Seq(42L), maxHops = 3)
    assert(d === Map(42L -> 0L))
  }
}
