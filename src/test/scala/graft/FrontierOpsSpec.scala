package graft

import org.apache.spark.sql.functions._

import graft.ops.{Agreement, BitmapIndex, CountMin, GlobalIndex, Robust,
  Skyline, Spearman, WeightedSample}

/** Property locks for the round-9 op tier: sketch guarantees, index
  * round trips, sampling invariants, exact-statistics hand values. */
class FrontierOpsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows without RNG state: hash mixing
  private def synth(n: Int) = spark.range(n.toLong).select(
    $"id",
    pmod(hash($"id" * 7L + 3L), lit(997)).cast("long").as("k"),
    pmod(hash($"id" * 13L + 1L), lit(100000)).cast("long").as("v"))

  test("count-min: estimate >= true count for EVERY key; exact when no " +
      "bucket collision; partitioning-invariant") {
    val df = synth(20000)
    val sketch = CountMin.build(df, $"k", depth = 4, width = 64)
    val est = CountMin.estimate(sketch, df, $"k", depth = 4, width = 64)
    val truth = df.groupBy($"k".as("tk")).agg(count(lit(1)).as("tn"))
    val joined = est.join(truth, $"k" === $"tk")
      .select($"k", $"est", $"tn").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS underestimated key ${r.getLong(0)}")
    }
    // the sketch is a merge-order-independent monoid: any partitioning
    // yields the identical cell table
    val repart = CountMin.build(df.repartition(13, $"v"), $"k", 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val orig = sketch.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(repart === orig.toSeq)
  }

  test("bitmap index: AND/OR/popcount algebra equals direct predicate " +
      "counts") {
    val df = synth(5000)
    val indexed = GlobalIndex.withGlobalIndex(df, "pos", $"id")
    val bitmaps = BitmapIndex.build(indexed, "pos", Map(
      "p" -> ($"k" % 3 === 0), "q" -> ($"v" < 40000)))
    val got = BitmapIndex.algebra(bitmaps, "p", "q").collect().head
    val want = df.agg(
      sum(when($"k" % 3 === 0, 1L).otherwise(0L)),
      sum(when($"v" < 40000, 1L).otherwise(0L)),
      sum(when($"k" % 3 === 0 && $"v" < 40000, 1L).otherwise(0L)),
      sum(when($"k" % 3 === 0 || $"v" < 40000, 1L).otherwise(0L)))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      === ((want.getLong(0), want.getLong(1), want.getLong(2),
        want.getLong(3))))
    indexed.unpersist(blocking = false)
  }

  test("weighted systematic sample: heavy rows always in, count ~ " +
      "target, deterministic under repartitioning") {
    val df = synth(3000).withColumn("w", $"v" % 500 + 1L)
    val total = df.agg(sum($"w")).as[Long].collect().head
    val target = 50L
    val stride = math.max(1L, total / target)
    val sel = WeightedSample.systematic(df, $"w", target, $"id")
    val ids = sel.select($"id").as[Long].collect().sorted.toSeq
    // every row whose weight spans a full stride MUST be selected
    val heavy = df.filter($"w" >= stride).select($"id").as[Long]
      .collect().toSet
    assert(heavy.subsetOf(ids.toSet),
      s"heavy rows missed: ${heavy -- ids.toSet}")
    // selected count is total/stride ± 1
    assert(math.abs(ids.size - total / stride) <= 1,
      s"selected ${ids.size}, expected ~${total / stride}")
    val ids2 = WeightedSample.systematic(
        df.repartition(17, $"v"), $"w", target, $"id")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(ids2 === ids, "sample changed under repartitioning")
  }

  test("cohen's kappa: hand-checked confusion table") {
    // the classic 2x2 example: 45 yes/yes, 15 yes/no, 25 no/yes, 15 no/no
    val rows = Seq.fill(45)(("y", "y")) ++ Seq.fill(15)(("y", "n")) ++
      Seq.fill(25)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val df = rows.toDF("r1", "r2")
    val got = Agreement.cohensKappa(df, $"r1", $"r2").collect().head
    assert(got.getAs[Long]("n") === 100L)
    assert(got.getAs[Long]("agree_n") === 60L)
    // pe_num = r1y*r2y + r1n*r2n = 60*70 + 40*30 = 5400
    // (published as BIGINT — raw decimal columns surface differently
    // per client engine, the round-10 hash-miss class)
    assert(got.getAs[Long]("pe_num") === 5400L)
    // kappa = (100*60 - 5400) / (10000 - 5400) = 600/4600
    assert(got.getAs[Long]("kappa_num") === 600L)
    assert(got.getAs[Long]("kappa_den") === 4600L)
    // the published kappa is quantized to 9 decimals (hash-stable
    // across engines) — compare against the same quantization
    assert(got.getAs[Double]("kappa")
      === BigDecimal(600.0 / 4600.0)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("spearman: perfect monotone = 1, reversed = -1, ties match the " +
      "tie-corrected hand formula") {
    val mono = (1 to 200).map(i => (i.toLong, (i * i).toLong))
      .toDF("x", "y")
    val rhoUp = Spearman.correlate(mono, $"x", $"y")
      .select($"rho").as[Double].collect().head
    assert(math.abs(rhoUp - 1.0) < 1e-12)
    val anti = (1 to 200).map(i => (i.toLong, (1000 - i).toLong))
      .toDF("x", "y")
    val rhoDown = Spearman.correlate(anti, $"x", $"y")
      .select($"rho").as[Double].collect().head
    assert(math.abs(rhoDown + 1.0) < 1e-12)
    // tie case, hand-computed: x=(1,2,2,3), y=(1,3,2,4)
    // rank2(x) = (2, 5, 5, 8); rank2(y) = (2, 6, 4, 8)
    val tied = Seq((1L, 1L), (2L, 3L), (2L, 2L), (3L, 4L)).toDF("x", "y")
    val r = Spearman.correlate(tied, $"x", $"y").collect().head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("sx") === 20L)
    assert(r.getAs[Long]("sy") === 20L)
    assert(r.getAs[Long]("sxy") === (2 * 2 + 5 * 6 + 5 * 4 + 8 * 8).toLong)
  }

  test("multi-pass linkage: pair caught by two passes scores ONCE; " +
      "union recall = either pass") {
    import graft.ops.RecordLinkage
    import graft.ops.RecordLinkage.FieldRule
    val a = Seq((1L, "k1", "x"), (2L, "k2", "y")).toDF("id_a", "ka", "fa")
    val b = Seq((10L, "k1", "x"), (20L, "zz", "y")).toDF("id_b", "kb", "fb")
    val rules = Seq(FieldRule("f", $"fa" === $"fb", 10, 5))
    val out = RecordLinkage.linkPasses(a, b,
      passes = Seq($"ka" === $"kb", $"fa" === $"fb"),
      idCols = Seq("id_a", "id_b"), rules = rules,
      tMatch = 10, tPossible = 0)
      .select($"id_a", $"id_b", $"score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // (1,10) caught by BOTH passes (key k1 AND field x) → one row;
    // (2,20) caught only by the field pass → one row
    assert(out === Seq((1L, 10L, 10L), (2L, 20L, 10L)))
  }

  test("advised multi-pass linkage == plain linkPasses on a HOT block " +
      "(the distribution the advisor exists for), struct keys") {
    import graft.ops.RecordLinkage
    import graft.ops.RecordLinkage.FieldRule
    // one block key carries 60% of the rows (hot), the rest are flat —
    // the advisor flags exactly the hot block and salts it; the output
    // must be the plain join's bag regardless
    val a = (1 to 200).map(i =>
      (i.toLong, if (i <= 120) "hot" else s"k$i", s"f${i % 7}"))
      .toDF("id_a", "ka", "fa")
    val b = (1 to 200).map(i =>
      (i.toLong + 1000L, if (i <= 120) "hot" else s"k${i + 3}", s"f${i % 5}"))
      .toDF("id_b", "kb", "fb")
    val rules = Seq(FieldRule("f", $"fa" === $"fb", 10, 5))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b", $"score", $"verdict").collect()
        .map(_.toString).sorted.toSeq
    val plain = norm(RecordLinkage.linkPasses(a, b,
      passes = Seq($"ka" === $"kb", $"fa" === $"fb"),
      idCols = Seq("id_a", "id_b"), rules = rules,
      tMatch = 10, tPossible = 0))
    val advised = norm(RecordLinkage.linkPassesAdvised(a, b,
      passKeys = Seq(struct($"ka") -> struct($"kb"),
        struct($"fa") -> struct($"fb")),
      idCols = Seq("id_a", "id_b"), rules = rules,
      tMatch = 10, tPossible = 0, hotFactor = 2L))
    assert(advised === plain)
    assert(plain.nonEmpty)
  }

  test("skyline: matches the brute-force dominance definition") {
    val pts = synth(2000).select(
      pmod($"k", lit(50)).cast("long").as("x"),
      pmod($"v", lit(50)).cast("long").as("y"))
    val got = Skyline.pareto2d(pts, $"x", $"y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = pts.distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = all.filter { case (x, y) =>
      !all.exists { case (x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }
    assert(got === brute)
  }

  test("encoding advisor: exact run counts across partition boundaries, " +
      "null-safe, verdicts by threshold") {
    import graft.ops.EncodingAdvisor
    // hand-built order: values AAAABBBBAAAA over ord 0..11 → 3 runs;
    // with a null pair in the middle: A A null null B → runs 3
    val runsDf = (0 until 12).map(i =>
      (i.toLong, if ((i / 4) % 2 == 0) "A" else "B")).toDF("ord", "v")
    // force many partitions so boundary stitching is exercised
    val spread = runsDf.repartition(7)
    val (n, ndv, runs) = EncodingAdvisor.profile(
      spread, Seq(col("ord")), "v")
    assert((n, ndv, runs) === ((12L, 2L, 3L)))
    val nullDf = Seq((0L, Some("A")), (1L, Some("A")), (2L, None),
      (3L, None), (4L, Some("B"))).toDF("ord", "v")
    val (n2, ndv2, runs2) = EncodingAdvisor.profile(
      nullDf.repartition(3), Seq(col("ord")), "v")
    assert(n2 === 5L)
    assert(runs2 === 3L, "null run must count as ONE run")
    assert(ndv2 === 2L) // COUNT(DISTINCT) semantics: nulls excluded
    val advice = EncodingAdvisor.advise(
        (0 until 160).map(i => (i.toLong, i / 40, i.toLong))
          .toDF("ord", "rle_col", "plain_col"),
        Seq(col("ord")), Seq("rle_col", "plain_col"))
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(advice === Map("rle_col" -> "RLE", "plain_col" -> "PLAIN"))
  }

  test("range-sum index: probe == direct sums on alignment edge cases") {
    import graft.ops.RangeSumIndex
    val df = synth(4000).select(($"id" * 3L).as("k"), $"v")
    val idx = RangeSumIndex.build(df, $"k", $"v", blockWidth = 64L)
    // index is metadata-sized: <= maxKey/64 + 1 entries
    assert(idx.count() <= 4000L * 3 / 64 + 1)
    val ranges = Seq(
      (1L, 0L, 63L),      // exactly one full block
      (2L, 64L, 64L),     // single key on a boundary
      (3L, 10L, 2000L),   // generic
      (4L, 128L, 511L),   // aligned both ends, multi-block
      (5L, 65L, 126L),    // strictly interior to one block
      (6L, 11990L, 99999L) // tail overrun
    ).toDF("id", "lo", "hi")
    val got = RangeSumIndex.probe(ranges, idx, df, $"k", $"v", 64L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val rows = df.select($"k", $"v").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = Seq((1L, 0L, 63L), (2L, 64L, 64L), (3L, 10L, 2000L),
      (4L, 128L, 511L), (5L, 65L, 126L), (6L, 11990L, 99999L))
      .map { case (id, lo, hi) =>
        val in = rows.filter(p => p._1 >= lo && p._1 <= hi)
        id -> ((in.map(_._2).sum, in.length.toLong))
      }.toMap
    assert(got === want)
  }

  test("range-sum index: NEGATIVE keys use floor blocks — no overcount " +
      "on boundary-aligned ranges (round-9 advice)") {
    import graft.ops.RangeSumIndex
    // keys −6000..5997 step 3: blocks below zero everywhere
    val df = synth(4000).select(($"id" * 3L - 6000L).as("k"), $"v")
    val idx = RangeSumIndex.build(df, $"k", $"v", blockWidth = 10L)
    val ranges = Seq(
      (1L, -20L, -1L),    // lo on a (floor) block boundary, hi at −1
      (2L, -20L, 19L),    // boundary-aligned both ends, crosses zero
      (3L, -29L, -21L),   // exactly the keys trunc-div misassigned
      (4L, -6000L, -5990L), // head of the domain
      (5L, -7L, 4L)       // strictly interior, crosses zero
    ).toDF("id", "lo", "hi")
    val got = RangeSumIndex.probe(ranges, idx, df, $"k", $"v", 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val rows = df.select($"k", $"v").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = Seq((1L, -20L, -1L), (2L, -20L, 19L), (3L, -29L, -21L),
      (4L, -6000L, -5990L), (5L, -7L, 4L))
      .map { case (id, lo, hi) =>
        val in = rows.filter(p => p._1 >= lo && p._1 <= hi)
        id -> ((in.map(_._2).sum, in.length.toLong))
      }.toMap
    assert(got === want)
  }

  test("grouped range-sum index: many ranges per group == direct sums; " +
      "a range never sees another group's blocks") {
    import graft.ops.RangeSumIndex
    val df = synth(3000).select(
      (($"id" % 3).cast("string")).as("g"), ($"id" * 2L).as("k"), $"v")
    val idx = RangeSumIndex.buildGrouped(df, $"g", $"k", $"v", 64L)
    val ranges = Seq(
      (1L, "0", 0L, 63L), (2L, "1", 0L, 63L),    // same window, two groups
      (3L, "2", 64L, 64L), (4L, "0", 10L, 2000L),
      (5L, "1", 128L, 511L), (6L, "2", 65L, 126L),
      (7L, "0", 5990L, 99999L)
    ).toDF("id", "g", "lo", "hi")
    val got = RangeSumIndex.probeGrouped(ranges, idx, df, $"g", $"k", $"v",
        64L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(5)))).toMap
    val rows = df.select($"g", $"k", $"v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = Seq((1L, "0", 0L, 63L), (2L, "1", 0L, 63L),
      (3L, "2", 64L, 64L), (4L, "0", 10L, 2000L), (5L, "1", 128L, 511L),
      (6L, "2", 65L, 126L), (7L, "0", 5990L, 99999L))
      .map { case (id, g, lo, hi) =>
        val in = rows.filter(p => p._1 == g && p._2 >= lo && p._2 <= hi)
        id -> ((in.map(_._3).sum, in.length.toLong))
      }.toMap
    assert(got === want)
    // the two same-window ranges (ids 1/2) answer from DIFFERENT groups
    assert(got(1L) != got(2L) || want(1L) == want(2L))
  }

  test("winsorized stats: clamps exactly at the rank-selected cuts") {
    // 1..1000 uniform: p5 cut = rank 50 → 50, p95 cut = rank 950 → 950
    val df = spark.range(1, 1001).select($"id",
      $"id".cast("double").as("value"))
    val r = Robust.winsorized(df, $"value", 50, 950, $"id")
      .collect().head
    assert(r.getAs[Long]("n") === 1000L)
    assert(r.getAs[Double]("lo") === 50.0)
    assert(r.getAs[Double]("hi") === 950.0)
    assert(r.getAs[Long]("n_low") === 49L)
    assert(r.getAs[Long]("n_high") === 50L)
    // wsum = 49 clamped-up rows + untouched middle + 50 clamped-down rows
    val expected = 49.0 * 50 + (50 to 950).sum + 50.0 * 950
    assert(math.abs(r.getAs[Double]("wsum") - expected) < 1e-9)
  }
}
