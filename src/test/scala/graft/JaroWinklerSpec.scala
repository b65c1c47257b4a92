package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinklerKernel

/** The jaro_winkler kernel (q149's scorer): Winkler's published examples,
  * the 0.7 boost threshold, degenerate inputs, symmetry on random pairs
  * vs an INDEPENDENT in-spec reference implementation, and SQL-surface
  * equality (codegen path ≡ kernel). */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // Independent reference: textbook O(|a|·|b|) Jaro with explicit
  // match-flag matrices, written from the definition (not the kernel's
  // single-pass form) so agreement is evidence, not tautology.
  private def refJaro(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val w = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val usedB = Array.fill(b.length)(false)
    val matchesA = scala.collection.mutable.ArrayBuffer.empty[Char]
    val matchesB = Array.fill(b.length)(' ')
    for (i <- a.indices) {
      var j = math.max(0, i - w)
      var found = false
      while (j < math.min(b.length, i + w + 1) && !found) {
        if (!usedB(j) && a(i) == b(j)) {
          usedB(j) = true; matchesA += a(i); matchesB(j) = b(j); found = true
        }
        j += 1
      }
    }
    val m = matchesA.length
    if (m == 0) return 0.0
    val bSeq = matchesB.zipWithIndex.filter { case (_, j) => usedB(j) }
      .map(_._1)
    val t = matchesA.zip(bSeq).count { case (x, y) => x != y } / 2
    (m.toDouble / a.length + m.toDouble / b.length +
      (m - t).toDouble / m) / 3.0
  }

  private def refJw(a: String, b: String): Double = {
    val j = refJaro(a, b)
    if (j > 0.7) {
      val p = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      j + p * 0.1 * (1.0 - j)
    } else j
  }

  test("Winkler's published examples") {
    // MARTHA/MARHTA: m=6, t=1, prefix 3
    val jMartha = (1.0 + 1.0 + 5.0 / 6.0) / 3.0
    assert(JaroWinklerKernel.jw("MARTHA", "MARHTA") ===
      jMartha + 3 * 0.1 * (1.0 - jMartha))
    // DIXON/DICKSONX: m=4, t=0, prefix 2
    val jDixon = (4.0 / 5.0 + 4.0 / 8.0 + 1.0) / 3.0
    assert(JaroWinklerKernel.jw("DIXON", "DICKSONX") ===
      jDixon + 2 * 0.1 * (1.0 - jDixon))
    // DWAYNE/DUANE: m=4, t=0, prefix 1
    val jDwayne = (4.0 / 6.0 + 4.0 / 5.0 + 1.0) / 3.0
    assert(JaroWinklerKernel.jw("DWAYNE", "DUANE") ===
      jDwayne + 0.1 * (1.0 - jDwayne))
  }

  test("prefix boost applies ONLY above jaro 0.7") {
    // Common prefix 2 but low jaro → NO boost (the DuckDB-pinned rule)
    val a = "abqqqqqq"; val b = "abzzz"
    val j = JaroWinklerKernel.jaro(a, b)
    assert(j <= 0.7)
    assert(JaroWinklerKernel.jw(a, b) === j)
  }

  test("degenerate inputs: empty → 0.0, identical → 1.0, disjoint → 0.0") {
    assert(JaroWinklerKernel.jw("", "abc") === 0.0)
    assert(JaroWinklerKernel.jw("abc", "") === 0.0)
    assert(JaroWinklerKernel.jw("", "") === 0.0) // DuckDB's convention
    assert(JaroWinklerKernel.jw("same", "same") === 1.0)
    assert(JaroWinklerKernel.jw("abc", "xyz") === 0.0)
  }

  test("kernel ≡ independent reference and symmetric on random pairs") {
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(60)(
      (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString)
    for (a <- words.take(20); b <- words.drop(20).take(20)) {
      assert(JaroWinklerKernel.jw(a, b) === refJw(a, b), s"jw($a, $b)")
      assert(JaroWinklerKernel.jw(a, b) === JaroWinklerKernel.jw(b, a),
        s"symmetry($a, $b)")
    }
  }

  test("SQL surface (codegen path) matches the kernel bit for bit") {
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("kettle", "kettel"), ("", "x"), ("abc", "abc"))
    val got = pairs.toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).as[Double].collect()
    assert(got.toSeq === pairs.map { case (a, b) =>
      JaroWinklerKernel.jw(a, b) })
  }

  test("null-intolerant: null input → null output") {
    val got = Seq((Option("abc"), Option.empty[String]))
      .toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).collect().head
    assert(got.isNullAt(0))
  }
}
