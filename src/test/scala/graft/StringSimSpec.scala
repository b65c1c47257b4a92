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
}
