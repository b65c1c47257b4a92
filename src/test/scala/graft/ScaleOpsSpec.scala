package graft

import org.apache.spark.sql.functions._

import graft.ops.{BloomJoin, Cleaning, Frequency, InvertedIndex, Similarity, SpanDedup}

/** Round-5 shuffle-reduction / index ops: bloom semi-join pruning,
  * sketch-verified heavy hitters, bounded inverted index. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("BloomJoin: pruned join == plain join; probe side actually shrinks") {
    val probe = (1L to 5000L).map(i => (i, i % 97)).toDF("pk", "payload")
    // build side holds 50 of the 5000 probe keys
    val build = (1L to 50L).map(i => (i * 100L, s"d$i")).toDF("bk", "name")

    val plain = probe.join(build, col("pk") === col("bk"))
      .orderBy("pk").collect()
    val pruned = BloomJoin.prunedJoin(probe, build, "pk", "bk",
        expectedItems = 100L, fpp = 0.01)
      .orderBy("pk").collect()
    assert(pruned.toSeq === plain.toSeq) // exact: fp's die in the join

    // the filter itself: no false negatives, and the pass-through set is
    // ~matches + fpp*non-matches, far below the full probe side
    val digest = BloomJoin.keyFilter(build, "bk", 100L, 0.01)
    val kept = probe.filter(BloomJoin.mightContain(digest, col("pk"))).count()
    assert(kept >= 50, "bloom dropped a true match")
    assert(kept < 500, s"bloom kept $kept of 5000 — no reduction")
    // null probe key: NULL (never passes), mirroring join semantics
    val n = Seq[Option[Long]](None).toDF("pk")
      .select(BloomJoin.mightContain(digest, col("pk")).as("m")).collect()
    assert(n.head.isNullAt(0))
  }

  test("Frequency.heavyHitters == exact group-count over the threshold") {
    // 10k rows: 'a' 4%, 'b' 1%, 'c' 0.5%, tail of ~9450 near-unique values
    val rows = Seq.fill(400)("a") ++ Seq.fill(100)("b") ++ Seq.fill(50)("c") ++
      (0 until 9450).map(i => s"t$i")
    val df = rows.toDF("v").repartition(7) // arbitrary partitioning
    val got = Frequency.heavyHitters(df, "v", support = 0.008)
      .orderBy(desc("cnt")).collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c > 0.008 * n }
      .toSeq.sortBy(-_._2)
    assert(got.toSeq === want) // exact output despite sketch-first pass
    assert(got.map(_._1).toSet === Set("a", "b"))
  }

  test("InvertedIndex: bounded postings, stable stats, admission floors") {
    val docs = Seq(
      (1L, "alpha bravo charlie alpha delta"),
      (2L, "charlie echo alpha"),
      (3L, "bravo charlie charlie foxtrot"),
      (4L, "zz short in")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, "doc_id", "text",
      minTermLen = 5, minDocs = 2, postingsK = 2)
    val rows = idx.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getInt(3), r.getLong(4), r.getInt(5)))
    // charlie: df=3, tf=4, first two postings (1,3) then (2,1)
    val charlie = rows.filter(_._1 == "charlie").sortBy(_._4)
    assert(charlie.map(t => (t._2, t._3)).distinct === Seq((3L, 4L)))
    assert(charlie.map(t => (t._4, t._5, t._6)) === Seq((1, 1L, 3), (2, 2L, 1)))
    // bounded: no term carries more than K posting rows
    assert(rows.groupBy(_._1).values.forall(_.size <= 2))
    // admission: 'delta'/'echo'/'foxtrot' are df=1 → out; short terms out
    assert(!rows.exists(t => Set("delta", "echo", "foxtrot", "zz", "in")(t._1)))
    // positions count ALL tokens (not just admitted): alpha in doc 1 at 1, 4
    val alpha = rows.filter(_._1 == "alpha").sortBy(_._4)
    assert(alpha.map(t => (t._5, t._6)) === Seq((1L, 1), (1L, 4)))
  }

  test("Cleaning.c4LineFilter: every rule fires; doc floor applies") {
    val docs = Seq(
      (1L, "Good first line with six words here.\n" +
        "short line.\n" +                       // < 5 words → drop
        "no terminal punctuation at all here\n" + // no ./!/? → drop
        "Cookie banner text with enough words here.\n" + // blocklist
        "function() { window.x = javascript }\n" +       // blocklist ×2
        "Another proper line that should survive!\n" +
        "A third good sentence keeps the doc alive?"),
      (2L, "Only one good line with enough words."),     // < 3 kept → doc out
      (3L, "")
    ).toDF("doc_id", "text")
    val got = Cleaning.c4LineFilter(docs, "doc_id", "text",
        minWords = 5, minLines = 3)
      .orderBy("doc_id").collect()
    val d1 = got(0)
    assert((d1.getInt(1), d1.getInt(2)) === ((7, 3)))
    assert(d1.getBoolean(5)) // doc_kept
    assert(d1.getString(4).split("\n").length === 3)
    val d2 = got(1)
    assert((d2.getInt(1), d2.getInt(2), d2.getBoolean(5)) === ((1, 1, false)))
    val d3 = got(2)
    assert((d3.getInt(1), d3.getInt(2), d3.getLong(3)) === ((0, 0, 0L)))
    assert(d3.getString(4) === "") // empty doc → empty cleaned, never null
  }

  test("SpanDedup: shared spans found, boilerplate cap excludes hot spans") {
    val run = "alpha bravo charlie delta" // 4-token span shared verbatim
    val docs = Seq(
      (1L, s"unique one words here $run tail one"),
      (2L, s"other beginning text $run different end"),
      (3L, s"third unrelated document body with no overlap at all"),
      // a 4-token span present in 4 docs → over maxDocs=3 → excluded
      (4L, "hot hot2 hot3 hot4 x"), (5L, "hot hot2 hot3 hot4 y"),
      (6L, "hot hot2 hot3 hot4 z"), (7L, "hot hot2 hot3 hot4 w")
    ).toDF("doc_id", "text")
    val pairs = SpanDedup.sharedSpanPairs(docs, "doc_id", "text",
      spanLen = 4, minDocs = 2, maxDocs = 3)
    val got = pairs.orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 1L))) // exactly the planted pair
    pairs.unpersist()
    // short docs (< spanLen tokens) contribute nothing, no crash
    val short = Seq((9L, "one two")).toDF("doc_id", "text")
    val p2 = SpanDedup.sharedSpanPairs(short, "doc_id", "text", spanLen = 4)
    assert(p2.count() === 0)
    p2.unpersist()
  }

  test("TimeSeries.anomalyDays: exact-integer z; degenerate keys yield null z") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // key A: days 1..5 with counts 1,1,1,1,6 → day 5 is the anomaly
    val rows =
      (1 to 4).map(d => ("A", ts(d))) ++
      Seq.fill(6)(("A", ts(5))) ++
      Seq(("B", ts(1))) ++                   // single day → D=1 → null z
      (1 to 3).map(d => ("C", ts(d)))        // constant series → var=0 → null z
    val df = rows.toDF("k", "ts")
    val got = graft.ops.TimeSeries.anomalyDays(df, "k", "ts", zThresh = 1.5)
      .orderBy("k", "day").collect()
    val a = got.filter(_.getString(0) == "A")
    assert(a.map(_.getLong(2)).toSeq === Seq(1L, 1L, 1L, 1L, 6L))
    // z reproduces the closed form: mean 2, var = (5*40-100)/20 = 5
    val z5 = a.last.getDouble(3)
    assert(math.abs(z5 - (6.0 - 2.0) / math.sqrt(5.0)) < 1e-15)
    assert(a.last.getBoolean(4)) // |1.789| > 1.5
    assert(a.init.forall(!_.getBoolean(4)))
    assert(got.filter(_.getString(0) == "B").forall(r => r.isNullAt(3) && !r.getBoolean(4)))
    assert(got.filter(_.getString(0) == "C").forall(r => r.isNullAt(3) && !r.getBoolean(4)))
  }

  test("TimeSeries.trailingActiveUsers: window math on a crafted week") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-02-$d%02d 09:00:00")
    // u1 active day 1; u2 active days 1 and 9; u3 active day 9
    val df = Seq((1L, ts(1)), (2L, ts(1)), (2L, ts(9)), (3L, ts(9)))
      .toDF("user_id", "ts")
    val got = graft.ops.TimeSeries.trailingActiveUsers(df, "ts", "user_id", 7)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // only days WITH data are reported; day 9 is > 7 days after day 1,
    // so day-1 users fell out of its trailing window
    assert(got.toSeq === Seq(("2024-02-01", 2L, 2L), ("2024-02-09", 2L, 2L)))
  }

  test("NgramLm.kneserNeyBigrams: closed-form probabilities; mass sums to 1") {
    val docs = Seq("a b a b a c").toDF("text")
    val m = graft.ops.NgramLm.kneserNeyBigrams(docs, "text", d = 0.75)
    val byPair = m.collect().map(r =>
      ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    m.unpersist()
    // counts: (a,b)=2 (a,c)=1 (b,a)=2; c1: a=3 b=2; N1+(a·)=2 N1+(b·)=1;
    // N1+(·b)=1 N1+(·a)=1 N1+(·c)=1; N1+(··)=3
    assert(byPair(("a", "b"))._1 === 2L)
    assert(math.abs(byPair(("a", "b"))._3 - (1.25 / 3 + (0.75 * 2 / 3) * (1.0 / 3))) < 1e-15)
    assert(math.abs(byPair(("a", "c"))._3 - (0.25 / 3 + (0.75 * 2 / 3) * (1.0 / 3))) < 1e-15)
    assert(math.abs(byPair(("b", "a"))._3 - (1.25 / 2 + (0.75 * 1 / 2) * (1.0 / 3))) < 1e-15)
    // probability mass: observed rows + backoff mass of unobserved
    // continuations telescopes to exactly 1 per context
    val massA = byPair(("a", "b"))._3 + byPair(("a", "c"))._3 +
      (0.75 * 2 / 3) * (1.0 / 3) // unobserved (a,a): cont(a)/total
    assert(math.abs(massA - 1.0) < 1e-12)
  }

  test("InvertedIndex.bm25TopK: closed-form score, deterministic order") {
    val docs = Seq(
      (1L, "spark spark spark filler words"),
      (2L, "spark alpha beta gamma delta"),
      (3L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = graft.ops.InvertedIndex.bm25TopK(docs, "doc_id", "text",
      Seq("spark"), k1 = 1.2, b = 0.75, topK = 3)
    val rows = got.collect().map(r => (r.getLong(0), r.getDouble(1)))
    got.unpersist()
    // N=3, df(spark)=2, dl=5 for all, avgdl=5 → length norm = 1
    // idf = (3-2+0.5)/(2+0.5) = 0.6; only docs containing a query term
    // are scored (doc 3 never enters the tf table)
    val idf = (3.0 - 2.0 + 0.5) / (2.0 + 0.5)
    def tfn(tf: Double) = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * 1.0))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L)) // tf desc, then id
    assert(math.abs(rows(0)._2 - idf * tfn(3)) < 1e-15)
    assert(math.abs(rows(1)._2 - idf * tfn(1)) < 1e-15)
  }

  test("Similarity.centroidAssign: nearest centroid wins; ties take lowest index") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0)) // 2 == 0
    val vecs = Seq(
      (1L, Seq(5.0f, 0.1f)),  // → centroid 0 (and 2, tie → 0)
      (2L, Seq(0.1f, 7.0f))   // → centroid 1
    ).toDF("vec_id", "embedding")
    val got = Similarity.centroidAssign(vecs, "vec_id", "embedding", cents)
      .select("vec_id", "cluster").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq === Seq((1L, 0), (2L, 1)))
  }
}
