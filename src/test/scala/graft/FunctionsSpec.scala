package graft

import org.apache.spark.sql.functions._

import graft.functions.{ArgMaxLongString, GraftFunctions}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash: native expression, interpreted == codegen == reference impl") {
    GraftFunctions.register(spark)
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    val df = Seq("", "a", "hello world", "héllo ✓ unicode").toDF("s")
    val got = df.selectExpr("s", "rolling_hash(s) AS h").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (s, h) => assert(h === ref(s), s"for '$s'") }
    // null propagates (nullIntolerant)
    val n = Seq[String](null).toDF("s").selectExpr("rolling_hash(s)").collect()
    assert(n.head.isNullAt(0))
  }

  test("rolling_hash survives whole-stage codegen in a grouped plan") {
    GraftFunctions.register(spark)
    val df = Seq(("x", "aa"), ("x", "aa"), ("y", "bb")).toDF("k", "s")
      .selectExpr("k", "rolling_hash(s) AS h")
      .groupBy("k", "h").count()
    assert(df.collect().length === 2)
  }

  test("vec_dot: native fused loop == builtin aggregate(zip_with) chain") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L)
      .map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    val pairs = vecs.crossJoin(
      vecs.select(col("id").as("id2"), col("v").as("w")))
    val both = pairs.select(
      graft.ops.Similarity.dot(col("v"), col("w")).as("native"),
      graft.ops.Similarity.dotBuiltin(col("v"), col("w")).as("builtin"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1))) // bit-identical
    }
    // null semantics: null array, null element, length mismatch → NULL
    val edge = Seq(
      (Seq(1.0f, 2.0f), null.asInstanceOf[Seq[Float]]),
      (Seq(1.0f, 2.0f), Seq(3.0f))
    ).toDF("a", "b")
      .select(graft.ops.Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(edge.forall(_.isNullAt(0)))
    val nullElem = spark.sql(
      "SELECT vec_dot(array(1.0D, NULL), array(1.0D, 2.0D)) AS d").collect()
    assert(nullElem.head.isNullAt(0))
  }

  test("cosine_sim: fused single loop == three-vec_dot chain, bit-identical") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L)
      .map(i => (i, Seq.fill(24)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    val pairs = vecs.crossJoin(
      vecs.select(col("id").as("id2"), col("v").as("w")))
    val both = pairs.select(
      graft.ops.Similarity.cosine(col("v"), col("w")).as("fused"),
      graft.ops.Similarity.cosineChain(col("v"), col("w")).as("chain"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1))) // incl. self-pairs (cos=1)
    }
    // null semantics match the chain: null array / length mismatch → NULL
    val edge = Seq(
      (Seq(1.0f, 2.0f), null.asInstanceOf[Seq[Float]]),
      (Seq(1.0f, 2.0f), Seq(3.0f))
    ).toDF("a", "b")
      .select(graft.ops.Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(edge.forall(_.isNullAt(0)))
    // DOCUMENTED DIVERGENCE on a zero vector: fused → IEEE NaN; the chain's
    // Divide raises DIVIDE_BY_ZERO under Spark 4's ANSI default
    val zdf = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val z = zdf
      .select(graft.ops.Similarity.cosine(col("a"), col("b")).as("fused"))
      .collect().head
    assert(z.getDouble(0).isNaN)
    val thrown = intercept[Exception] {
      zdf.select(graft.ops.Similarity.cosineChain(col("a"), col("b")).as("c"))
        .collect()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("simhash64: native fused loop == builtin 64-aggregate chain") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = (0 until 40).map(_ => Seq.fill(1 + rnd.nextInt(50))(rnd.nextLong()))
    val df = rows.toDF("hs")
    val both = df.select(
      graft.ops.Dedup.simhashFromHashes(col("hs")).as("native"),
      graft.ops.Dedup.simhashFromHashesBuiltin(col("hs")).as("builtin"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // empty array: all counters 0 → no bits set, both formulations
    val empty = spark.sql("SELECT simhash64(CAST(array() AS ARRAY<BIGINT>)) d")
      .collect()
    assert(empty.head.getLong(0) === 0L)
    // DOCUMENTED DIVERGENCE on a NULL element: the native propagates NULL,
    // the builtin chain accidentally yields an all-zero fingerprint (the
    // NULL sums fail every `> 0` test) — callers pre-filter nulls
    val nulls = Seq(Seq(Option(1L), Option.empty[Long])).toDF("hs").select(
      graft.ops.Dedup.simhashFromHashes(col("hs")).as("native"),
      graft.ops.Dedup.simhashFromHashesBuiltin(col("hs")).as("builtin"))
      .collect().head
    assert(nulls.isNullAt(0))
    assert(nulls.getLong(1) === 0L)
  }

  test("minhash_sig: native fused loop == builtin transform/array_min chain") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(17)
    val rows = (0 until 30).map(_ => Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt()))
    val df = rows.toDF("ih")
    val both = df.select(
      graft.ops.Dedup.minhashSignature(col("ih"), 16).as("native"),
      graft.ops.Dedup.minhashSignatureBuiltin(col("ih"), 16).as("builtin"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Int](0).toSeq === r.getSeq[Int](1).toSeq)
    }
    // DOCUMENTED DIVERGENCE on an empty array: the native yields NULL (no
    // minima exist), the builtin yields k NULL entries (array_min of an
    // empty transform) — callers guarantee ≥1 shingle per doc
    val empty = spark.sql(
      """SELECT minhash_sig(CAST(array() AS ARRAY<INT>), 4) AS n""").collect()
    assert(empty.head.isNullAt(0))
    val emptyBuiltin = Seq(Seq.empty[Int]).toDF("ih")
      .select(graft.ops.Dedup.minhashSignatureBuiltin(col("ih"), 4).as("b"))
      .collect().head
    assert(emptyBuiltin.getSeq[Any](0).forall(_ == null))
  }

  test("sorted_intersect_size: merge count == size(array_intersect) on sorted-distinct input") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(19)
    // small value range forces overlaps; inputs normalized like the engine's
    // hashed shingle sets (distinct + sorted)
    val rows = (0 until 50).map(_ => (
      Seq.fill(rnd.nextInt(30))(rnd.nextInt(20)).distinct.sorted,
      Seq.fill(rnd.nextInt(30))(rnd.nextInt(20)).distinct.sorted))
    val df = rows.toDF("a", "b")
    val both = df.select(
      graft.ops.Dedup.intersectSize(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()
    both.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("sorted_intersect_size: long-array variant == size(array_intersect)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(23)
    // negative values included: the merge must order by signed long
    val rows = (0 until 50).map(_ => (
      Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong - 10L).distinct.sorted,
      Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong - 10L).distinct.sorted))
    val df = rows.toDF("a", "b")
    val both = df.select(
      graft.ops.Dedup.intersectSize(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()
    both.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("ngram_hashes: fused window hashing == builtin transform/slice/concat_ws/xxhash64 chain") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two",                     // fewer words than n -> one whole-doc shingle
      "single",
      "",                            // zero words -> hash of empty string
      "a a a a a",                   // repeated words
      "héllo ✓ unicode twice héllo ✓")
      .toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val bad = docs.select(
          graft.ops.Dedup.shingleHashes(col("text"), n).as("fused"),
          transform(graft.ops.Dedup.shingles(col("text"), n),
            s => xxhash64(s)).as("chain"))
        .filter(not(col("fused") <=> col("chain"))).count()
      assert(bad === 0L, s"n=$n diverged")
    }
    // null text propagates
    val nulls = Seq[String](null).toDF("text")
      .select(graft.ops.Dedup.shingleHashes(col("text"), 3)).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("hamming_bucket_pairs: bucket kernel == equi-join + bit_count filter") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(23)
    // clustered fingerprints so some pairs fall within the bound
    val rows = (0 until 400).map { i =>
      val centroid = Array(0L, -1L, 0x5555555555555555L)(rnd.nextInt(3))
      val fp = (0 until rnd.nextInt(20)).foldLeft(centroid)(
        (f, _) => f ^ (1L << rnd.nextInt(64)))
      (i.toLong, fp, rnd.nextInt(4)) // bucket key 0-3
    }
    val df = rows.toDF("id", "fp", "bkt")
    val maxDist = 15
    val joined = df.as("a").join(df.as("b"), col("a.bkt") === col("b.bkt"))
      .filter(col("a.id") < col("b.id"))
      .filter(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val grouped = df.groupBy("bkt")
      .agg(collect_list(struct(col("id"), col("fp"))).as("av"))
    val kernel = grouped.join(grouped.withColumnRenamed("av", "bv")
          .withColumnRenamed("bkt", "bkt2"), col("bkt") === col("bkt2"))
      .select(explode(call_function("hamming_bucket_pairs",
        col("av"), col("bv"), lit(maxDist))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kernel === joined && kernel.nonEmpty)
    // empty buckets yield empty arrays, and null input yields null
    val empty = Seq((Seq.empty[(Long, Long)], Seq.empty[(Long, Long)]))
      .toDF("av", "bv")
      .select(size(call_function("hamming_bucket_pairs",
        col("av"), col("bv"), lit(3)))).collect()
    assert(empty.head.getInt(0) === 0)
  }

  test("morton_key: fused native expression == builtin shift/mask chain") {
    GraftFunctions.register(spark)
    val corners = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L, -1L, -65536L)
    val rnd = new scala.util.Random(11)
    val pairs = (for (a <- corners; b <- corners) yield (a, b)) ++
      Seq.fill(200)((rnd.nextLong(), rnd.nextLong()))
    val df = pairs.toDF("x", "y")
    val out = df.select(
        graft.ops.ZOrder.zkey2(col("x"), col("y")).as("chain"),
        graft.ops.ZOrder.zkeyNative(col("x"), col("y")).as("fused"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // null propagation matches the chain (null in -> null out)
    val n = Seq[(java.lang.Long, java.lang.Long)]((null, 1L), (1L, null))
      .toDF("x", "y")
      .select(graft.ops.ZOrder.zkeyNative(col("x"), col("y")))
      .collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("ArgMax aggregator == struct-max formulation (tie-consistent)") {
    val argmax = new ArgMaxLongString().toColumn
    val data = Seq(
      ("g1", 5L, "low"), ("g1", 9L, "win"), ("g1", 9L, "zed"), // tie at 9 → "zed"
      ("g2", 1L, "only"))
    val ds = data.toDF("g", "k", "p").as[(String, Long, String)]
    val viaAggregator = ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(argmax.name("best"))
      .collect().toMap
    val viaStructMax = data.toDF("g", "k", "p")
      .groupBy($"g").agg(max(struct($"k", $"p")).as("m"))
      .select($"g", $"m.p")
      .as[(String, String)].collect().toMap
    assert(viaAggregator === viaStructMax)
    assert(viaAggregator("g1") === "zed")
  }
}
