package graft

import org.apache.spark.sql.functions._

import graft.ops.{Auc, CardEst, ColumnStats, Pq, Privacy, Sampling, Skew, SplitSearch, Triangles}

/** The statistics-and-index ops behind q174-q178: triangle counting on a
  * hand graph (one wedge per triangle, star has none), the stacked
  * column-stats collector's NDV/null/MCV arithmetic, the exact Gini
  * split table on a 6-row fixture, distinct l-diversity including the
  * null-sensitive edge, and PQ encode/ADC on binary-exact floats
  * (tie-break to the lowest code id, subspace-ordered fold). */
class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("Triangles.participation: two shared-edge triangles, star counts zero") {
    // K4 on {1,2,3,4} minus edge {3,4}: triangles (1,2,3) and (1,2,4);
    // {5,6} an isolated edge; {7,8},{7,9},{7,10} a star (wedges, no closes)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (5L, 6L), (7L, 8L), (7L, 9L), (7L, 10L)).toDF("id_a", "id_b")
    val got = Triangles.participation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("Triangles.transitivity: 3T over wedges as exact integers") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (5L, 6L), (7L, 8L), (7L, 9L), (7L, 10L)).toDF("id_a", "id_b")
    val r = Triangles.transitivity(edges).collect().head
    // T = 2; wedges: deg 3,3,2,2,1,1,3,1,1,1 → 3+3+1+1+3 = 11
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 11L, 6L, 11L)))
  }

  test("Triangles.clusteringCoefficients: exact pairs, star center reports 0") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (5L, 6L), (7L, 8L), (7L, 9L), (7L, 10L)).toDF("id_a", "id_b")
    val got = Triangles.clusteringCoefficients(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // degree-1 vertices (5,6,8,9,10) are excluded; the star center 7 has
    // 3 wedges and 0 triangles — the row that distinguishes census from
    // coefficient
    assert(got === Map(
      1L -> ((3L, 2L, 3L)), 2L -> ((3L, 2L, 3L)),
      3L -> ((2L, 1L, 1L)), 4L -> ((2L, 1L, 1L)),
      7L -> ((3L, 0L, 3L))))
  }

  test("ColumnStats.stackedStats: NDV excludes null, MCV ties rank by value") {
    val df = Seq(
      (Some("x"), "q"), (Some("x"), "q"), (Some("y"), "q"), (None, "p"))
      .toDF("a", "b")
    val got = ColumnStats.stackedStats(df, Seq("a", "b"), topK = 3)
      .orderBy(col("col_name"), col("mcv_rank")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getString(5), r.getLong(6)))
    assert(got === Seq(
      ("a", 4L, 1L, 2L, 1, "x", 2L),
      ("a", 4L, 1L, 2L, 2, "y", 1L),
      ("b", 4L, 0L, 2L, 1, "q", 3L),
      ("b", 4L, 0L, 2L, 2, "p", 1L)))
  }

  test("ColumnStats.stackedStats: all-null column keeps its stats row") {
    val df = Seq(("x", Option.empty[String]), ("y", None))
      .toDF("a", "b")
    val got = ColumnStats.stackedStats(df, Seq("a", "b"), topK = 2)
      .orderBy(col("col_name"), col("mcv_rank").asc_nulls_last).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1 else r.getInt(4),
        if (r.isNullAt(5)) null else r.getString(5)))
    // column b is all null: one row survives with (n_rows=2, n_nulls=2,
    // ndv=0) and a null MCV triple — never silently dropped
    assert(got === Seq(
      ("a", 2L, 0L, 2L, 1, "x"),
      ("a", 2L, 0L, 2L, 2, "y"),
      ("b", 2L, 2L, 0L, -1, null)))
  }

  test("SplitSearch.giniSplitTable: exact components, max threshold excluded") {
    // v=1: ++, v=2: +-, v=3: -- (n=6, pos=3)
    val df = Seq((1L, true), (1L, true), (2L, true), (2L, false),
      (3L, false), (3L, false)).toDF("f", "lbl")
    val got = SplitSearch.giniSplitTable(df, "f", "lbl")
      .orderBy(col("threshold")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDecimal(5).longValueExact,
        r.getDecimal(6).longValueExact))
    // t=1: left (2+,0-) ssq 4, right (1+,3-) ssq 10 → num 4·4+10·2=36, den 8
    // t=2: left (3+,1-) ssq 10, right (0+,2-) ssq 4 → num 10·2+4·4=36, den 8
    assert(got === Seq(
      (1L, 2L, 2L, 4L, 1L, 36L, 8L),
      (2L, 4L, 3L, 2L, 0L, 36L, 8L)))
  }

  test("SplitSearch.giniSplitTableMulti: per-feature windows, mirrored feature symmetric") {
    val df = Seq((1L, true), (1L, true), (2L, true), (2L, false),
      (3L, false), (3L, false)).toDF("f", "lbl")
    val got = SplitSearch.giniSplitTableMulti(df,
        Seq("fwd" -> col("f"), "rev" -> (lit(4L) - col("f"))), "lbl")
      .orderBy(col("feature"), col("threshold")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDecimal(6).longValueExact,
        r.getDecimal(7).longValueExact))
    // fwd ≡ the single-feature fixture; rev mirrors it (labels reversed
    // end-for-end), so every component table is the left/right swap
    assert(got === Seq(
      ("fwd", 1L, 2L, 2L, 4L, 1L, 36L, 8L),
      ("fwd", 2L, 4L, 3L, 2L, 0L, 36L, 8L),
      ("rev", 1L, 2L, 0L, 4L, 3L, 36L, 8L),
      ("rev", 2L, 4L, 1L, 2L, 2L, 36L, 8L)))
  }

  test("Privacy.lDiversityAudit: homogeneous group fails, null sensitive ignored") {
    val df = Seq(
      ("g1", Some("a")), ("g1", Some("a")), ("g1", Some("b")), ("g1", Some("c")),
      ("g2", Some("a")), ("g2", Some("a")), ("g2", Some("a")),
      ("g3", None), ("g3", Some("a"))).toDF("qi", "s")
    val got = Privacy.lDiversityAudit(df, Seq("qi"), "s", l = 3L)
      .orderBy(col("qi")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got === Seq(
      ("g1", 4L, 3L, true), ("g2", 3L, 1L, false), ("g3", 2L, 1L, false)))
  }

  test("Auc.exactAuc: midrank ties, hand-checked 7/8") {
    // scores (label): 1(−), 2(−), 2(+), 3(+) — ranks 1, 2.5, 2.5, 4;
    // Σranks₊ = 6.5, U = 6.5 − 3 = 3.5, AUC = 3.5/4 → num/den = 7/8
    val df = Seq((1.0, false), (2.0, false), (2.0, true), (3.0, true))
      .toDF("score", "label")
    val r = Auc.exactAuc(df, col("score"), col("label")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)) ===
      ((2L, 2L, "7", "8")))

    // perfect separation → AUC 1: num == den
    val sep = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("score", "label")
    val s = Auc.exactAuc(sep, col("score"), col("label")).collect().head
    assert((s.getString(2), s.getString(3)) === (("8", "8")))

    // degenerate one-class input: the fraction is 0/0 — undefined, not
    // fabricated (ranks 1..3 → 2Σr₊ = 12, minus n₊(n₊+1) = 12)
    val onlyPos = Seq((1.0, true), (2.0, true), (3.0, true))
      .toDF("score", "label")
    val o = Auc.exactAuc(onlyPos, col("score"), col("label")).collect().head
    assert((o.getLong(0), o.getLong(1), o.getString(2), o.getString(3)) ===
      ((3L, 0L, "0", "0")))
  }

  test("Skew.skewAdvisor: cross-multiplied verdict, ceil salt buckets") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val got = Skew.skewAdvisor(df, "k", hotFactor = 1L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // n=10, ndv=3: a 6·3=18 > 10 → hot, ⌈18/10⌉ = 2 buckets;
    // b 9 ≤ 10 and c 3 ≤ 10 stay out
    assert(got.toSeq === Seq(("a", 6L, 2L)))
  }

  test("CardEst.joinSizeAudit: product-sum actual, Selinger estimate, nulls out") {
    val l = Seq(Some(1L), Some(1L), Some(2L), None).toDF("k")
    val r = Seq(1L, 2L, 2L, 3L).toDF("k")
    val row = CardEst.joinSizeAudit("t", l, "k", r, "k").collect().head
    // n_l=3 (null excluded), n_r=4, ndv 2/3; actual = 2·1 + 1·2 = 4;
    // est = 3·4 div 3 = 4
    assert((row.getString(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4), row.getLong(5), row.getLong(6)) ===
      (("t", 3L, 4L, 2L, 3L, 4L, 4L)))
  }

  test("Sampling.largestRemainderAllocation: floors + largest remainders, exact") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("src")
    val got = Sampling.largestRemainderAllocation(df, "src", budget = 7L)
      .orderBy(col("src")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // quotas 3.5 / 2.1 / 1.4: floors 3+2+1 = 6, one leftover seat to the
    // largest remainder (a, 5/10); total seats == budget
    assert(got === Seq(("a", 5L, 3L, 5L, 4L), ("b", 3L, 2L, 1L, 2L),
      ("c", 2L, 1L, 4L, 1L)))

    // remainder tie: both strata at .5, one seat left → first by name
    val tie = Seq("a", "b").toDF("src")
    val gotTie = Sampling.largestRemainderAllocation(tie, "src", budget = 5L)
      .orderBy(col("src")).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    assert(gotTie === Seq(("a", 3L), ("b", 2L)))
  }

  test("Pq: sampled codebook, encode ties to lowest code, ADC folds exactly") {
    // dim 4, M=2, K=2; all coordinates binary-exact doubles
    val emb = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(1f, 1f, 1f, 1f)),
      (2L, Seq(0f, 0f, 1f, 1f)),
      (3L, Seq(0.75f, 0.75f, 0.25f, 0.25f)),
      (4L, Seq(0.5f, 0.5f, 0f, 0f))).toDF("vec_id", "embedding")
    val cb = Pq.sampledCodebook(emb, "vec_id", "embedding", dim = 4, m = 2, k = 2)
    assert(cb.count() === 4) // 2 subspaces × 2 codes

    val codes = Pq.encode(emb, "vec_id", "embedding", cb, dim = 4, m = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    // id3: m0 [0.75,0.75] → code1 (0.125 < 1.125); m1 [0.25,0.25] → code0
    assert(codes((3L, 0)) === 1 && codes((3L, 1)) === 0)
    // id4: m0 [0.5,0.5] equidistant (0.5 both) → lowest code id 0
    assert(codes((4L, 0)) === 0)

    val top = Pq.adcTopK(codes = Pq.encode(emb, "vec_id", "embedding", cb, 4, 2),
        idCol = "vec_id", codebook = cb,
        query = Seq(0f, 0f, 1f, 1f), dim = 4, m = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // exact ADC: id2 = 0; id0 = 0+2; id1 = 2+0; id4 = 0+2; id3 = 2+2
    assert(top === Seq((2L, 0.0), (0L, 2.0), (1L, 2.0), (4L, 2.0), (3L, 4.0)))
  }

  test("Pq.ivfPqTopK: only the probed cell's vectors are candidates") {
    // 2 cells = vectors 0 ([0,0,0,0]) and 1 ([4,4,4,4]); the query
    // [0,0,1,1] routes to cell 0 (dist 2 vs 54) with nProbe=1, so id1 and
    // id5 (assigned to cell 1) can never appear even though id5's ADC
    // distance would beat id0's
    val emb = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(4f, 4f, 4f, 4f)),
      (2L, Seq(0f, 0f, 1f, 1f)),
      (3L, Seq(1f, 1f, 1f, 1f)),
      (5L, Seq(3f, 3f, 3f, 3f))).toDF("vec_id", "embedding")
    val got = Pq.ivfPqTopK(emb, "vec_id", "embedding",
        query = Seq(0f, 0f, 1f, 1f), dim = 4, m = 2, codebookK = 2,
        nCells = 2, nProbe = 1, k = 10)
      .collect().map(r => r.getLong(0))
    // cell 0 members: 0 (0 vs 64), 2 (2 vs 50), 3 (4 vs 36) — 1, 5 in cell 1
    assert(got.toSet === Set(0L, 2L, 3L))
    assert(!got.contains(5L) && !got.contains(1L))
  }

  test("Pq.ivfPqResidualTopK: residual codebook separates what raw ties") {
    // centroids = ids 0,1; residuals r0=r1=[0,0,0,0], r2=[1,1,0,0],
    // r3=[0,0,1,1]; codebookK=3 → residual codes m0: {[0,0],[0,0],[1,1]}
    val emb = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(4f, 4f, 4f, 4f)),
      (2L, Seq(1f, 1f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 1f))).toDF("vec_id", "embedding")
    val got = Pq.ivfPqResidualTopK(emb, "vec_id", "embedding",
        query = Seq(1f, 1f, 1f, 1f), dim = 4, m = 2, codebookK = 3,
        nCells = 2, nProbe = 1, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // query routes to cell 0 (4 vs 36); q_res=[1,1,1,1]; id2 encodes
    // m0→code2 (exact) so ADC = 0+2; id0/id3 ride zero codes → 4; id1
    // (cell 1) excluded despite being a real vector
    assert(got === Seq((2L, 2.0), (0L, 4.0), (3L, 4.0)))
  }
}
