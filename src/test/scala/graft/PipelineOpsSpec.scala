package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Chunking, Cleaning, TimeSeries, Tfidf}

/** Round-4 pipeline operators: time-series gap-fill, chunking, cleaning
  * (boilerplate lines + PII scrub), TF-IDF — edge cases the oracle-gated
  * queries (q50-q52, q54, q56, q51) don't isolate. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dailyForwardFill densifies gaps, carries value, zeroes counts") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0),
      (1L, ts("2024-01-01 11:00:00"), 7.0),
      (1L, ts("2024-01-04 09:00:00"), 1.5),
      (2L, ts("2024-03-10 00:00:00"), 2.0) // single-day key
    ).toDF("user_id", "ts", "value")
    val filled = TimeSeries.dailyForwardFill(df, "user_id", "ts",
        sum(col("value").cast("decimal(18,2)")))
    val out = filled
      .orderBy("user_id", "day")
      .select(col("user_id"), col("day"), col("n"),
        col("value").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3)))
    filled.unpersist() // op pins its result; the caller owns the release
    assert(out.toSeq === Seq(
      (1L, "2024-01-01", 2L, 12.0), // two events summed
      (1L, "2024-01-02", 0L, 12.0), // gap: carried forward
      (1L, "2024-01-03", 0L, 12.0),
      (1L, "2024-01-04", 1L, 1.5),  // new value replaces carry
      (2L, "2024-03-10", 1L, 2.0))) // single-day spine
  }

  test("chunk covers the text with the declared overlap; empty text -> one empty chunk") {
    val df = Seq((1L, "abcdefghij"), (2L, "")).toDF("id", "text")
    val out = Chunking.chunk(df, "id", "text", size = 4, stride = 3)
      .orderBy("id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (1L, 0L, 1L, 4, "abcd"),
      (1L, 1L, 4L, 4, "defg"),  // 1-char overlap with previous
      (1L, 2L, 7L, 4, "ghij"),
      (1L, 3L, 10L, 1, "j"),    // tail clamps
      (2L, 0L, 1L, 0, "")))     // empty doc still yields provenance row
    // reassembly: stride-aligned prefixes reconstruct the original
    val first3 = out.filter(t => t._1 == 1L).map(_._5.take(3)).mkString
    assert(first3.startsWith("abcdefghi"))
  }

  test("boilerplate lines: recurring trimmed lines across distinct docs; ratio") {
    val docs = Seq(
      (1L, "real content\n  (c) 2024 ACME  \nmore text"),
      (2L, "other words\n(c) 2024 ACME\n\n"),
      (3L, "(c) 2024 ACME\nunique line"),
      (4L, "no template here")
    ).toDF("doc_id", "text")
    val dict = Cleaning.boilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(dict.toSeq === Seq(("(c) 2024 ACME", 3L))) // trim folds doc 1's padding
    val ratios = Cleaning.boilerplateRatio(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ratios.toSeq === Seq(
      (1L, 3L, 1L), (2L, 2L, 1L), (3L, 2L, 1L), (4L, 1L, 0L)))
  }

  test("scrubPii counts each insertion once (no double-count across rules)") {
    val df = Seq(
      (1L, "mail a123456789@x.co now"),      // 9-digit run INSIDE the email
      (2L, "call +1-555-23-45 or 987654321"), // phone + bare long number
      (3L, "clean text")
    ).toDF("id", "text")
    val out = Cleaning.scrubPii(df, "text").orderBy("id")
      .select("scrubbed", "n_redactions")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out(0) === (("mail <EMAIL> now", 1L))) // email ate its digits: 1, not 2
    assert(out(1) === (("call <PHONE> or <NUM>", 2L)))
    assert(out(2) === (("clean text", 0L)))
  }

  test("tfidf ranks rarer terms above common ones; ties break by term asc") {
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana cherry cherry"),
      (3L, "apple banana")
    ).toDF("doc_id", "text")
    val ranked = Tfidf.topTerms(docs, "doc_id", "text", k = 2, minLen = 4)
    val top = ranked.orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(4)))
    ranked.unpersist() // op pins its result; the caller owns the release
    // doc 1: apple tf=2 df=2 -> 2*3/2=3.0 ; banana tf=1 df=3 -> 1.0 ;
    //        cherry tf=1 df=2 -> 1.5  => apple, cherry
    assert(top.filter(_._1 == 1L).map(_._2).toSeq === Seq("apple", "cherry"))
    // doc 2: cherry tf=2 df=2 -> 3.0 ; banana tf=1 df=3 -> 1.0
    assert(top.filter(_._1 == 2L).map(_._2).toSeq === Seq("cherry", "banana"))
    // doc 3: apple 1*3/2=1.5, banana 1*3/3=1.0
    assert(top.filter(_._1 == 3L).map(_._2).toSeq === Seq("apple", "banana"))
    assert(top.find(t => t._1 == 1L && t._2 == "apple").get._3 === 3.0)
  }

  test("repetitionStats: looped phrase flagged, varied text clean, short docs safe") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),     // trigram loop + top word
      (2L, "the quick brown fox jumps over dogs"), // varied: clean
      (3L, "hi"),                                  // < 3 words: no trigrams
      (4L, " ")                                    // zero words after filter
    ).toDF("doc_id", "text")
    val out = graft.ops.Cleaning.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    // doc 1: 8 words {buy,now}x4 -> top=4; 6 trigrams, 2 distinct
    assert(out(0) === ((1L, 8L, 2L, 4L, 6L, 2L, true)))
    // doc 2: 7 words all distinct, 5 trigrams all distinct -> clean
    assert(out(1) === ((2L, 7L, 7L, 1L, 5L, 5L, false)))
    // doc 3: 1 word -> top_word_count*5 > n_words flags single-word docs
    //        as degenerate (1*5 > 1) — the intended behavior for "hi"
    assert(out(2) === ((3L, 1L, 1L, 1L, 0L, 0L, true)))
    // doc 4: no words at all -> all zeros, not repetitive, no crash
    assert(out(3) === ((4L, 0L, 0L, 0L, 0L, 0L, false)))
  }
}
