package graft

import graft.ops.ContainmentJoin

/** Containment prefix filtering is exact (the pigeonhole prune plus the
  * positional bound are recall-lossless), so the spec exercises the edges
  * the proof leans on — subset pairs Jaccard misses, the asymmetric probe
  * direction, the integer ceil at the threshold boundary, duplicate
  * collapse — then compares wholesale against brute force. */
class ContainmentJoinSpec extends SparkSpec {
  import spark.implicits._

  private def toksDf(rows: (Long, Seq[String])*) =
    rows.toDF("id", "toks")

  private def run(df: org.apache.spark.sql.DataFrame, num: Int, den: Int) =
    ContainmentJoin.prefixContainmentJoin(df, "id", "toks", num, den)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2))
      .toSeq

  test("strict subset scores containment 1.0 despite tiny Jaccard") {
    // A = 2 tokens inside B's 10: J = 2/10 = 0.2, containment = 1
    val df = toksDf(
      1L -> Seq("a", "b"),
      2L -> (Seq("a", "b") ++ (1 to 8).map("x" + _)))
    assert(run(df, 1, 2) === Seq((1L, 2L, 2, 1.0)))
  }

  test("threshold boundary is inclusive and exact (exactly θ)") {
    // min side 4 tokens, inter 2 -> containment exactly 1/2
    val at = toksDf(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "e", "f", "g", "h"))
    assert(run(at, 1, 2) === Seq((1L, 2L, 2, 0.5)))
    // inter 1 of min-4 -> 1/4 < 1/2: excluded
    val below = toksDf(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "e", "f", "g", "h", "i"))
    assert(run(below, 1, 2) === Seq.empty)
  }

  test("equal-size sets pair once (probe fires both ways, distinct collapses)") {
    val df = toksDf(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "b", "d"))
    assert(run(df, 2, 3) === Seq((1L, 2L, 2, 2.0 / 3)))
  }

  test("duplicate tokens collapse before sizing; empty sets never pair") {
    val df = toksDf(
      1L -> Seq("a", "a", "b"),      // set {a,b}
      2L -> Seq("b", "b", "a", "a"), // set {a,b}
      3L -> Seq.empty[String])
    assert(run(df, 1, 1) === Seq((1L, 2L, 2, 1.0)))
  }

  test("θ = 1 keeps only full containment of the smaller side") {
    val df = toksDf(
      1L -> Seq("a", "b"),
      2L -> Seq("a", "b", "c"),
      3L -> Seq("a", "c", "d"))
    // 1⊆2 fully; 1∩3 = {a} (1/2); 2∩3 = {a,c} (2/3)
    assert(run(df, 1, 1) === Seq((1L, 2L, 2, 1.0)))
  }

  test("matches brute force on a dense random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'p').map(_.toString)
    val rows = (1L to 40L).map { id =>
      id -> rnd.shuffle(vocab).take(2 + rnd.nextInt(8)).toSeq
    }
    val df = toksDf(rows: _*)
    val got = run(df, 2, 3)
    val sets = rows.toMap.view.mapValues(_.toSet).toMap
    val want = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a < b
      ia = sets(a).intersect(sets(b)).size
      m = math.min(sets(a).size, sets(b).size)
      if ia * 3 >= m * 2
    } yield (a, b, ia, ia.toDouble / m)).sortBy(t => (t._1, t._2))
    assert(got === want)
  }
}
