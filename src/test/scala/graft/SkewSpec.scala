package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salting transforms are pure exchange-topology changes — results must
  * equal the unsalted plans on skewed data. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 90% on one hot key
  private lazy val skewed = spark.range(10000)
    .select(
      when($"id" % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), $"id" % 7)).as("k"),
      ($"id" % 97).cast("double").as("v"))

  test("saltedAggregate == plain groupBy for sum/count/max/min on skewed keys") {
    val plainDf = skewed.groupBy($"k").agg(
      sum($"v").as("s"), count(lit(1)).as("c"), max($"v").as("mx"), min($"v").as("mn"))
    val saltedDf = Skew.saltedAggregate(skewed, $"k", buckets = 8, Map(
      "s" -> Skew.sumOf($"v"), "c" -> Skew.countAll,
      "mx" -> Skew.maxOf($"v"), "mn" -> Skew.minOf($"v")))
    // drop-in contract: the caller's key column name survives the salting
    // (names + types; the re-aggregated count is nullable-typed where the
    // single-phase count is not — a value-level non-difference, every group
    // has ≥1 partial)
    assert(saltedDf.schema.map(f => (f.name, f.dataType)) ===
      plainDf.schema.map(f => (f.name, f.dataType)))
    val plain = plainDf.collect().map(r => r.getString(0) -> (r.getDouble(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = saltedDf.collect().map(r => r.getAs[String]("k") ->
      (r.getAs[Double]("s"), r.getAs[Long]("c"),
        r.getAs[Double]("mx"), r.getAs[Double]("mn"))).toMap
    assert(salted === plain)
  }

  test("saltedAggregate names an expression key via keyName") {
    val out = Skew.saltedAggregate(skewed, upper($"k"), buckets = 4,
      Map("c" -> Skew.countAll), keyName = "k_upper")
    assert(out.columns.toSeq === Seq("k_upper", "c"))
  }

  test("advisedAggregate == plain groupBy; only advised keys are salted") {
    val plain = skewed.groupBy($"k").agg(
        sum($"v").as("s"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2)))).toMap
    val advised = Skew.advisedAggregate(skewed, "k", hotFactor = 2L,
      Map("s" -> Skew.sumOf($"v"), "c" -> Skew.countAll))
    assert(advised.collect().map(r => r.getString(0) ->
      ((r.getDouble(1), r.getLong(2)))).toMap === plain)
    // the advisor (hotFactor 2, mean n/8) flags exactly the 90% key: its
    // verdict is freq·ndv/(2n) = ⌈0.9·8/2⌉ = 4 buckets, every other key
    // stays on the single-group path
    val verdicts = Skew.skewAdvisor(skewed, "k", hotFactor = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(verdicts === Map("hot" -> 4L))
  }

  test("advisedJoin == plain join on skewed keys (inner and left)") {
    val dim = Seq(("hot", 100), ("k1", 1), ("k3", 3), ("absent", 9))
      .toDF("dk", "weight")
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, $"k" === $"dk", jt)
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"weight").as("w"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getAs[Any]("w")))).toMap
      val advised = Skew.advisedJoin(skewed, dim, "k", "dk",
          hotFactor = 2L, jt)
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"weight").as("w"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getAs[Any]("w")))).toMap
      assert(advised === plain, s"join type $jt")
    }
  }

  test("advised salting beats the unsalted plan on a 90%-hot fan-out join") {
    // the workload where key skew GENUINELY serializes: a sort-merge
    // join whose hot key's probe × fan-out output (~900M rows) lands on
    // ONE reducer unsalted — no partial aggregation exists to save a
    // join the way map-side combine saves an algebraic GROUP BY
    val n = 1000000L
    val big = spark.range(n).select(
      when($"id" % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("k"), $"id" % 7)).as("k"),
      ($"id" % 97).as("v"))
    val fanout = spark.range(1000).crossJoin(
        Seq("hot", "k0", "k1", "k2", "k3", "k4", "k5", "k6").toDF("dk"))
      .select($"dk", $"id".as("w"))
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcKey)
    spark.conf.set(bcKey, "-1") // force the shuffle join skew is about
    try {
      def time(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
        // min of 2 passes (the bench policy) — co-tenant noise guard;
        // the probe-side arithmetic makes every joined row cost real
        // work, so the hot key's ~900M-row output is what the one
        // unsalted reducer must grind through alone
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val r = df.agg(count(lit(1)), sum($"v" * $"w")).collect().head
          ((System.nanoTime() - t0) / 1e9, r.getLong(0))
        }
        (runs.map(_._1).min, runs.head._2)
      }
      val (plainSec, plainRows) =
        time(big.join(fanout, $"k" === $"dk", "inner"))
      val (advisedSec, advisedRows) =
        time(Skew.advisedJoin(big, fanout, "k", "dk", hotFactor = 1L))
      assert(advisedRows === plainRows)
      info(f"unsalted $plainSec%.2f s vs advised $advisedSec%.2f s " +
        f"(${plainSec / advisedSec}%.1fx) over $plainRows%d joined rows")
      assert(advisedSec < plainSec,
        f"advised plan ($advisedSec%.2f s) did not beat unsalted " +
          f"($plainSec%.2f s)")
    } finally spark.conf.set(bcKey, prev)
  }

  test("q220's derived key: advisor flags exactly user 0, answer == plain join") {
    // the gate's skew construction (every even event_id collapses onto
    // user 0 → ~50% of rows on one key) must trip the advisor at EVERY
    // SF: key 0's freq·ndv ≈ (n/2)·ndv, a tolerable key's ≈ n/2, so
    // hotFactor 4 separates them as long as ndv > 8
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
    val left = ev.select($"event_type", $"value",
      when($"event_id" % 2 === 0, lit(0L)).otherwise($"user_id")
        .as("skew_uid"))
    val verdicts = Skew.skewAdvisor(left, "skew_uid", hotFactor = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the recommendation caps at the session's shuffle parallelism, so
    // state the expectation the same way instead of assuming the test
    // session's partitions (4) exceed the uncapped verdict
    val cap = spark.conf.get("spark.sql.shuffle.partitions").toLong
    assert(verdicts ===
      Map(0L -> math.min(2L, cap))) // 533·15 / (4·1000) → ⌈2.0⌉ = 2
    val out = graft.queries.FrontierQueries
      .q220AdvisedJoinSkew(spark, dir).collect()
    val profile = ev.groupBy($"user_id")
      .agg(count(lit(1)).as("user_events"))
    val expected = left.join(profile, $"skew_uid" === $"user_id")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"user_events").as("sum_user_events"),
        sum($"value".cast("decimal(18,2)")).as("sum_value"))
      .withColumn("sum_value", $"sum_value".cast("double"))
      .orderBy($"event_type").collect()
    assert(out.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq)
  }

  test("maybeHot pre-verdict: certifies flat distributions, cannot " +
      "rule out hot ones") {
    // flat: 20k near-unique keys (mean freq 1) — certified not hot
    val flat = spark.range(20000).select($"id".as("k"))
    assert(!Skew.maybeHot(flat, "k", hotFactor = 16L),
      "flat near-unique keys flagged maybe-hot")
    // moderate multiplicity, still flat: 4k keys × 5 rows each
    val flat5 = spark.range(20000).select(($"id" % 4000).as("k"))
    assert(!Skew.maybeHot(flat5, "k", hotFactor = 16L),
      "flat 5-per-key distribution flagged maybe-hot")
    // hot: the 90%-on-one-key frame — must NOT be certified flat
    assert(Skew.maybeHot(skewed, "k", hotFactor = 2L),
      "90%-hot key certified flat (unsound skip)")
    // q220's shape: 50% of rows on key 0
    val half = spark.range(10000).select(
      when($"id" % 2 === 0, lit(0L)).otherwise($"id").as("k"))
    assert(Skew.maybeHot(half, "k", hotFactor = 4L),
      "50%-hot key certified flat (unsound skip)")
    // empty frame: nothing to salt
    assert(!Skew.maybeHot(flat.filter(lit(false)), "k", 16L))
  }

  test("advisedJoin pre-verdict: flat keys take the PLAIN join plan " +
      "(no salt columns, no advice broadcast), hot keys stay salted; " +
      "answers equal either way") {
    val flat = spark.range(5000).select($"id".as("k"), ($"id" % 97).as("v"))
    val dim = spark.range(5000).select($"id".as("dk"), ($"id" % 7).as("w"))
    val fj = Skew.advisedJoin(flat, dim, "k", "dk", hotFactor = 16L)
    assert(!fj.queryExecution.analyzed.toString.contains("__salt_l"),
      "flat keys did not take the plain-join fall-through:\n" +
        fj.queryExecution.analyzed.toString)
    val plain = flat.join(dim, $"k" === $"dk")
    assert(fj.collect().map(_.toSeq).sortBy(_.toString).toSeq ===
      plain.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // hot side: the salted plan (with its __salt_l machinery) survives
    val dimS = Seq(("hot", 100), ("k1", 1)).toDF("dk", "w")
    val hj = Skew.advisedJoin(skewed, dimS, "k", "dk", hotFactor = 2L)
    assert(hj.queryExecution.analyzed.toString.contains("__salt_l"),
      "hot keys lost the salted plan to the pre-verdict")
    // and preVerdict = false forces the salted plan on flat keys too
    val forced = Skew.advisedJoin(flat, dim, "k", "dk", 16L,
      joinType = "inner", preVerdict = false)
    assert(forced.queryExecution.analyzed.toString.contains("__salt_l"))
    assert(forced.collect().map(_.toSeq).sortBy(_.toString).toSeq ===
      plain.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("maybeHotKeys memoizes by canonicalized key-frame plan: an " +
      "identical second call reuses the verdict (no new entry), a " +
      "different plan or factor computes fresh") {
    Skew.clearVerdictMemo()
    assert(Skew.verdictMemoSize === 0)
    def flat = spark.range(3000).select($"id".as("k"))
    val v1 = Skew.maybeHot(flat, "k", 16L)
    assert(Skew.verdictMemoSize === 1)
    // structurally identical plan (fresh DataFrame object) — memo hit
    val v2 = Skew.maybeHot(flat, "k", 16L)
    assert(v2 === v1)
    assert(Skew.verdictMemoSize === 1, "identical plan re-sketched")
    // different hotFactor — distinct statistic, fresh entry
    Skew.maybeHot(flat, "k", 4L)
    assert(Skew.verdictMemoSize === 2)
    // different plan — fresh entry
    Skew.maybeHot(spark.range(4000).select($"id".as("k")), "k", 16L)
    assert(Skew.verdictMemoSize === 3)
    Skew.clearVerdictMemo()
    assert(Skew.verdictMemoSize === 0)
  }

  test("advisedAggregate pre-verdict: flat keys take the single-phase " +
      "plan with the two-phase schema (dtype-identical drop-in)") {
    val flat = spark.range(5000).select(($"id" % 1000).as("k"),
      ($"id" % 97).cast("decimal(18,2)").as("v"))
    val fast = Skew.advisedAggregate(flat, "k", 16L,
      scala.collection.immutable.ListMap("s" -> Skew.sumOf($"v"),
        "c" -> Skew.countAll))
    val forced = Skew.advisedAggregate(flat, "k", 16L,
      scala.collection.immutable.ListMap("s" -> Skew.sumOf($"v"),
        "c" -> Skew.countAll), preVerdict = false)
    assert(fast.schema.map(f => (f.name, f.dataType)) ===
      forced.schema.map(f => (f.name, f.dataType)),
      "pre-verdict path diverged from the salted plan's schema")
    assert(fast.collect().map(_.toSeq).sortBy(_.toString).toSeq ===
      forced.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("saltedJoin == plain join on skewed keys (inner and left)") {
    val dim = Seq(("hot", 100), ("k1", 1), ("k3", 3), ("absent", 9))
      .toDF("dk", "weight")
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, $"k" === $"dk", jt)
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"weight").as("w"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Any]("w"))).toMap
      val salted = Skew.saltedJoin(skewed, dim, $"k", $"dk", buckets = 8, jt)
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"weight").as("w"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Any]("w"))).toMap
      assert(salted === plain, s"join type $jt")
    }
  }

  test("salts are deterministic expressions (replay-safe, SPARK-23207)") {
    // a nondeterministic salt in the shuffle key drops/duplicates rows
    // when lost map outputs are recomputed with fresh salt draws; every
    // salting transform must therefore build a fully deterministic plan
    val dim = Seq(("hot", 100), ("k1", 1)).toDF("dk", "weight")
    val plans = Seq(
      "saltedAggregate" -> Skew.saltedAggregate(skewed, $"k", 8,
        Map("c" -> Skew.countAll)),
      "saltedJoin" -> Skew.saltedJoin(skewed, dim, $"k", $"dk", 8),
      "advisedAggregate" -> Skew.advisedAggregate(skewed, "k", 2L,
        Map("c" -> Skew.countAll)),
      "advisedJoin" -> Skew.advisedJoin(skewed, dim, "k", "dk", 2L))
    for ((name, df) <- plans) {
      val nondet = df.queryExecution.analyzed.flatMap(_.expressions)
        .flatMap(_.collect { case x if !x.deterministic => x })
      assert(nondet.isEmpty,
        s"$name plan carries nondeterministic expressions: " +
          nondet.map(_.toString).distinct.mkString("; "))
    }
    // and the deterministic salt still spreads the hot key over buckets
    val spread = skewed
      .withColumn("s", pmod(hash(skewed.columns.map(col).toSeq: _*), lit(8)))
      .filter($"k" === "hot").select($"s").distinct().count()
    assert(spread === 8L, s"content salt spread only $spread of 8 buckets")
  }
}
