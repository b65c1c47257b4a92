package graft

import graft.ops.Drift

/** KS drift edges: identical cohorts give 0, disjoint supports give
  * n1·n2, and random cohorts match an in-process integer reference. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (String, Long)*): (Long, Long, Long, Double) = {
    val r = Drift.ksDrift(rows.toDF("g", "v"), "g", "v", "a", "b")
      .collect().head
    // ks_scaled is the DECIMAL(38,0) exact product rendered as a string
    // (it overflows int64 at >~3e9-row cohorts) — parse it back for the
    // small-fixture assertions
    (r.getLong(0), r.getLong(1), r.getString(2).toLong, r.getDouble(3))
  }

  test("identical distributions: ks = 0") {
    val (n1, n2, s, ks) = run(
      ("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
    assert((n1, n2, s, ks) === ((2L, 2L, 0L, 0.0)))
  }

  test("disjoint supports: ks = 1 (scaled n1*n2)") {
    val (n1, n2, s, ks) = run(
      ("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("b", 11L))
    assert((n1, n2, s) === ((3L, 2L, 6L)))
    assert(ks === 1.0)
  }

  test("matches an in-process integer reference on random cohorts") {
    val rnd = new scala.util.Random(31)
    val a = Seq.fill(80)(rnd.nextInt(20).toLong)
    val b = Seq.fill(50)(rnd.nextInt(25).toLong)
    val rows = a.map(("a", _)) ++ b.map(("b", _))
    val (n1, n2, s, _) = run(rows: _*)
    assert((n1, n2) === ((80L, 50L)))
    val pts = (a ++ b).distinct.sorted
    val want = pts.map { x =>
      math.abs(a.count(_ <= x).toLong * n2 - b.count(_ <= x).toLong * n1)
    }.max
    assert(s === want)
  }

  test("duplicated values collapse into one CDF step") {
    // a = {5,5,5}, b = {5}: CDFs equal at the only point -> ks 0
    val (_, _, s, _) = run(("a", 5L), ("a", 5L), ("a", 5L), ("b", 5L))
    assert(s === 0L)
  }

  test("ksDriftMatrix pairs agree with pairwise ksDrift") {
    val rnd = new scala.util.Random(17)
    val rows = for {
      g <- Seq("a", "b", "c")
      _ <- 1 to 40
    } yield (g, rnd.nextInt(g.hashCode % 7 + 10).toLong)
    val df = rows.toDF("g", "v")
    val matrix = Drift.ksDriftMatrix(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4).toLong))).toMap
    assert(matrix.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    for (((ga, gb), (na, nb, ks)) <- matrix) {
      val ref = Drift.ksDrift(df, "g", "v", ga, gb).collect().head
      assert((na, nb, ks) ===
        ((ref.getLong(0), ref.getLong(1), ref.getString(2).toLong)),
        s"pair ($ga, $gb)")
    }
  }
}
