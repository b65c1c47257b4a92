package graft

import org.apache.spark.sql.functions._

import graft.ops.StringSim

/** Blocked edit-distance join: NULL strings must not form a degenerate
  * shared block, and the size-capped variant bounds per-task candidates
  * on a deliberately hot block while matching the uncapped join exactly
  * on well-blocked data. */
class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private def lastToken(s: org.apache.spark.sql.Column) =
    concat_ws("#", element_at(split(s, " "), -1))

  test("NULL strings produce no pairs AND no degenerate block") {
    val df = Seq(
      (1L, Some("red widget")), (2L, Some("hot widget")),
      (3L, None), (4L, None), (5L, None)).toDF("id", "name")
    val pairs = StringSim.editDistancePairs(df, "id", "name", lastToken, 4)
    assert(pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet ===
      Set((1L, 2L)))
    // the NULL rows must be gone BEFORE the join — concat_ws maps NULL to
    // "" so, unfiltered, ids 3/4/5 would all meet in one '' block and pay
    // O(n_nulls^2) comparisons that can never pass the distance filter.
    // Here the optimizer folds the IsNotNull filter straight into the
    // LocalRelation (ConvertToLocalRelation), so the join leaves must
    // carry ONLY the 2 non-null rows each:
    val joined = pairs.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.head
    def leafRows(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectLeaves().map {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          l.data.size
        case other => fail(s"unexpected leaf: $other")
      }.sum
    assert(leafRows(joined.left) === 2 && leafRows(joined.right) === 2,
      "NULL rows must be pruned from both join inputs before blocking")
  }

  test("chunked variant equals the uncapped join when every block fits the cap") {
    val df = Seq(
      (1L, "red widget"), (2L, "hot widget"), (3L, "big widget"),
      (4L, "tiny gear"), (5L, "shiny gear")).toDF("id", "name")
    val full = StringSim.editDistancePairs(df, "id", "name", lastToken, 4)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    val chunked = StringSim.editDistancePairsChunked(
        df, "id", "name", lastToken, maxDist = 4, cap = 10)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(chunked === full)
  }

  test("a hot block is split: per-chunk candidate count is bounded by cap") {
    // one pathological block ("x" * 2000 sharing a last token) that the
    // uncapped join would compare all-pairs (2000^2 = 4M); the cap keeps
    // each chunk at <= 100 rows => <= 100*99/2 pairs per chunk
    val hot = (1L to 2000L).map(i => (i, s"row$i common")).toDF("id", "name")
    val cap = 100
    val keyed = StringSim.editDistancePairsChunked(
      hot, "id", "name", lastToken, maxDist = 1000, cap = cap)
    // distance cap chosen permissive so candidate survival == candidate
    // generation; with 2000 rows in 20 chunks of 100 the pair count is
    // 20 * C(100,2), not C(2000,2)
    val nPairs = keyed.count()
    assert(nPairs === 20L * (cap.toLong * (cap - 1) / 2),
      s"expected per-chunk-bounded candidates, got $nPairs")
    // and chunk membership is deterministic (same input -> same pairs)
    assert(keyed.count() === nPairs)
  }

  test("word-drop blocking == brute force restricted to the documented " +
      "recall; empty-remainder passes are suppressed") {
    val rows = Seq(
      (1L, "red widget"), (2L, "rose widget"),      // one word changed
      (3L, "red gadget"),                           // other word changed
      (4L, "alpha beta gamma"), (5L, "alpha zeta gamma"), // D1 on 3 words
      (6L, "alpha zz yy"),                          // D2 vs 4 (adjacent)
      (7L, "bolt"), (8L, "bolt"), (9L, "rod"),      // 1-word: exact only
      (10L, "old bolt"), (11L, "cold rod")          // 2-word, BOTH words
        // changed: dist 4 but NOT a candidate — the degenerate D2 block
        // (empty remainder) is suppressed, else every 2-word string
        // would pair with every other (the all-pairs quadratic)
    )
    val df = rows.toDF("id", "name")
    val got = StringSim.editDistancePairsWordDrop(df, "id", "name", 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force oracle: the documented recall predicate
    def words(s: String) = s.split(" ").toSeq
    def candidate(a: String, b: String): Boolean = {
      val (wa, wb) = (words(a), words(b))
      if (a == b) true
      else if (wa.length != wb.length) false
      else {
        val diff = wa.indices.filter(i => wa(i) != wb(i))
        (diff.length == 1 && wa.length >= 2) ||
          (diff.length == 2 && diff(1) == diff(0) + 1 && wa.length >= 3)
      }
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && candidate(sa, sb) && lev(sa, sb) <= 6
    } yield (ia, ib)).toSet
    assert(got === want)
    assert(got.contains((1L, 2L)) && got.contains((4L, 5L)) &&
      got.contains((7L, 8L)), "substitution + exact-dup recall")
    assert(!got.contains((10L, 11L)),
      "2-word both-words-changed pair must NOT be a candidate")
  }

  test("value-collapsed name pairs reconstruct the row-level histogram " +
      "exactly under heavy multiplicity") {
    // 3 distinct names with multiplicities 4/3/2 + a singleton with no
    // neighbors — the tiny-domain/huge-multiplicity shape where
    // row-level blocking is quadratic in rows
    val rows = (1L to 4L).map(i => (i, "red widget")) ++
      (5L to 7L).map(i => (i, "rose widget")) ++
      (8L to 9L).map(i => (i, "red gadget")) ++
      Seq((10L, "lonely unique thing"))
    val df = rows.toDF("id", "name")
    val rowLevel = StringSim.editDistancePairsWordDrop(df, "id", "name", 4)
      .groupBy($"dist").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    val namePairs = StringSim.editDistanceNamePairs(df, "id", "name", 4)
    val cross = namePairs
      .select($"dist", ($"n_a" * $"n_b").as("np")).as[(Int, Long)].collect()
    val self = df.groupBy($"name").agg(count(lit(1)).as("c"))
      .filter($"c" >= 2)
      .select(lit(0).as("dist"), expr("c * (c - 1) div 2").as("np"))
      .as[(Int, Long)].collect()
    val reconstructed = (cross ++ self).groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).sum }
    assert(reconstructed === rowLevel)
    // representatives are the min id per name; counts are multiplicities
    val reps = namePairs.select($"s_a", $"id_a", $"n_a")
      .union(namePairs.select($"s_b", $"id_b", $"n_b"))
      .distinct().as[(String, Long, Long)].collect()
      .map { case (s, i, n) => s -> ((i, n)) }.toMap
    assert(reps("red widget") === ((1L, 4L)))
    assert(reps("rose widget") === ((5L, 3L)))
    assert(reps("red gadget") === ((8L, 2L)))
  }
}
