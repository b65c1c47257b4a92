package graft

import org.apache.spark.sql.functions._

import graft.ops.SetSimJoin

/** Prefix filtering is an EXACT algorithm: completeness is a theorem, so
  * the spec's job is to exercise the edges the proof leans on — the length
  * filter, the integer ceil, boundary Jaccards, duplicate collapse — and
  * then compare wholesale against brute force on a corpus dense enough to
  * stress every branch. */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def toksDf(rows: (Long, Seq[String])*) =
    rows.toDF("id", "toks")

  test("finds identical sets, skips disjoint ones") {
    val df = toksDf(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "b", "c"),
      3L -> Seq("x", "y", "z"))
    val out = SetSimJoin.prefixJaccardJoin(df, "id", "toks", 6, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("threshold boundary is inclusive and exact (J exactly 6/10)") {
    // |A|=4, |B|=4, inter=3 -> J = 3/5 = 0.6 exactly
    val df = toksDf(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"))
    val out = SetSimJoin.prefixJaccardJoin(df, "id", "toks", 6, 10).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(2) === 0.6)
    // one token fewer shared -> J = 2/6 < 0.6: excluded
    val df2 = toksDf(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "e", "f"))
    assert(SetSimJoin.prefixJaccardJoin(df2, "id", "toks", 6, 10).count() === 0)
  }

  test("duplicate tokens collapse before sizing") {
    val df = toksDf(
      1L -> Seq("a", "a", "a", "b"), // set {a,b}
      2L -> Seq("a", "b", "b"))      // set {a,b}
    val out = SetSimJoin.prefixJaccardJoin(df, "id", "toks", 9, 10).collect()
    assert(out.length === 1 && out.head.getDouble(2) === 1.0)
  }

  test("empty and null sets never pair") {
    val df = toksDf(
      1L -> Seq.empty[String],
      2L -> Seq("a"),
      3L -> Seq("a"))
    val out = SetSimJoin.prefixJaccardJoin(df, "id", "toks", 5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((2L, 3L)))
  }

  test("matches brute force on a dense synthetic corpus") {
    // 60 sets over a 12-token vocabulary: plenty of pairs on both sides
    // of the threshold, sizes 3..8, plenty of length-filter kills
    val vocab = ('a' to 'l').map(_.toString)
    val rows = (0L until 60L).map { i =>
      val sz = 3 + (i % 6).toInt
      val start = (i * 7 % 12).toInt
      i -> (0 until sz).map(j => vocab((start + j * (1 + i % 3).toInt) % 12)).distinct
    }
    val df = toksDf(rows: _*)
    val got = SetSimJoin.prefixJaccardJoin(df, "id", "toks", 6, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val sets = rows.map { case (i, t) => i -> t.toSet }.toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      union = sets(a).size + sets(b).size - inter
      if inter * 10 >= union * 6
    } yield (a, b)).toSet
    assert(want.nonEmpty && got === want)
  }
}
