package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** BPE merge training (q151's engine): the fold's leftmost-non-overlap
  * semantics on crafted chains, and full merge rounds against an
  * independent in-process reference on random vocabularies. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Independent reference: explicit imperative scan, written from the
  // definition (not the fold's accumulator form).
  private def refApply(syms: Seq[String], a: String,
                       b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private def refRounds(vocab: Seq[(Seq[String], Long)],
                        k: Int): Seq[(Int, String, String, Long)] = {
    var v = vocab
    (1 to k).flatMap { step =>
      val counts = v.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) None
      else {
        val ((a, b), cnt) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        v = v.map { case (s, f) => (refApply(s, a, b), f) }
        Some((step, a, b, cnt))
      }
    }
  }

  test("applyMerge: leftmost-non-overlapping on overlap chains") {
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a", Seq("aa", "a")),
      (Seq("a", "a", "a", "a"), "a", "a", Seq("aa", "aa")),
      (Seq("x", "a", "b", "a", "b", "y"), "a", "b", Seq("x", "ab", "ab", "y")),
      (Seq("a", "b"), "a", "b", Seq("ab")),
      (Seq("b", "a"), "a", "b", Seq("b", "a")),
      (Seq("q"), "a", "b", Seq("q")))
    for ((in, a, b, want) <- cases) {
      val got = Seq(Tuple1(in)).toDF("syms")
        .select(Bpe.applyMerge(col("syms"), a, b)).as[Seq[String]]
        .collect().head
      assert(got === want, s"applyMerge($in, $a, $b)")
      assert(got === refApply(in, a, b), s"ref parity($in, $a, $b)")
    }
  }

  test("mergeRounds matches the in-process reference on random vocab") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq.fill(40)(
      ((1 to (1 + rnd.nextInt(7)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar.toString),
        1L + rnd.nextInt(9)))
    val df = vocab.toDF("syms", "freq")
    assert(Bpe.mergeRounds(df, 4) === refRounds(vocab, 4))
  }

  test("single-symbol-only vocab yields no merges") {
    val df = Seq((Seq("a"), 5L), (Seq("b"), 3L)).toDF("syms", "freq")
    assert(Bpe.mergeRounds(df, 2) === Seq.empty)
  }
}
