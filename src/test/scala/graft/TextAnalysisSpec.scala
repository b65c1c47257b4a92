package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column) =
    spark.range(1).select(c.as("v")).collect().head

  test("token counts: whitespace vs BPE-ish") {
    assert(one(TextAnalysis.tokenCountWs(lit("a  b c "))).getInt(0) === 3)
    // hello , world 42 ! → 5 subword tokens
    assert(one(TextAnalysis.tokenCountBpe(lit("hello, world42!"))).getInt(0) === 5)
  }

  test("stopword ratio counts distinct stopword hits over token count") {
    val r = one(TextAnalysis.stopwordRatio(lit("the cat and the dog"))).getDouble(0)
    assert(r === 2.0 / 5.0) // {the, and} distinct over 5 tokens
    assert(one(TextAnalysis.stopwordRatio(lit(""))).getDouble(0) === 0.0)
  }

  test("language id picks highest marker count; tie order en-first; und on none") {
    assert(one(TextAnalysis.langId(lit("the cat is of and"))).getString(0) === "en")
    assert(one(TextAnalysis.langId(lit("el que la de los"))).getString(0) === "es")
    assert(one(TextAnalysis.langId(lit("xyz abc"))).getString(0) === "und")
    // 'la' is a marker for both es and fr → es wins only with more hits;
    // single shared token: declaration order decides (es before fr)
    assert(one(TextAnalysis.langId(lit("la"))).getString(0) === "es")
  }

  test("fingerprint normalizes case and whitespace") {
    val a = one(TextAnalysis.fingerprint(lit("  Hello   World "))).getString(0)
    val b = one(TextAnalysis.fingerprint(lit("hello world"))).getString(0)
    assert(a === b)
  }

  test("quality score is in [0,1] and rewards stopword glue") {
    val hi = one(TextAnalysis.qualityScore(
      lit("the quick brown fox and the lazy dog run over the hill with a friend in tow"))).getDouble(0)
    val lo = one(TextAnalysis.qualityScore(lit("x"))).getDouble(0)
    assert(hi > lo && hi <= 1.0 && lo >= 0.0)
  }
}
