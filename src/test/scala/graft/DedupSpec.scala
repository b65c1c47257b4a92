package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "a"),
    (2L, "the quick brown fox jumps over the lazy cat", "a"), // near-dup of 1
    (3L, "completely different words entirely here now", "a"),
    (4L, "the quick brown fox jumps over the lazy dog", "b"), // exact dup of 1
    (5L, "one two", "b"),
    (6L, "", "b")
  ).toDF("doc_id", "text", "source")

  test("exact dedup groups identical normalized texts, keeper = min id") {
    val res = Dedup.exact(docs, col("doc_id"), col("text"))
      .orderBy(col("keeper_id")).collect()
    val byKeeper = res.map(r => r.getAs[Long]("keeper_id") -> r.getAs[Long]("n_copies")).toMap
    assert(byKeeper(1L) === 2) // docs 1 and 4
    assert(byKeeper(2L) === 1)
    assert(res.length === 5)
  }

  test("shingles: n-grams, short-text fallback, empty text") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[String]]("sh")).toMap
    assert(sh(1L).head === "the quick brown")
    assert(sh(1L).length === 7) // 9 words → 7 trigrams
    assert(sh(5L) === Seq("one two")) // < n words → whole text
    assert(sh(6L) === Seq(""))
  }

  test("MinHash+LSH finds the near-dup pairs that brute-force Jaccard finds") {
    val brute = Dedup.ngramJaccardPairs(
        docs.withColumn("all", lit(1)), "doc_id", "text", "all", n = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 2, k = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh === brute) // full recall at this scale, no false positives post-verify
  }

  test("incremental LSH == one-shot LSH restricted to cross-split pairs") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = d.filter(col("doc_id") % 10 =!= 0)
    val batch = d.filter(col("doc_id") % 10 === 0)
    val idx = Dedup.buildMinhashIndex(corpus, "doc_id", "text", n = 2)
    val incRes = Dedup.minhashLshPairsIncremental(batch, idx, "doc_id", "text",
      n = 2, threshold = 0.5)
    val inc = incRes
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    incRes.unpersist(blocking = true)
    val fullRes = Dedup.minhashLshPairs(d, "doc_id", "text",
      n = 2, threshold = 0.5)
    val crossAll: Set[(Long, Long)] = fullRes
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cross = crossAll
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b) => if (a % 10 == 0) (a, b) else (b, a) }
    fullRes.unpersist(blocking = true)
    assert(inc === cross)
    assert(inc.nonEmpty) // the split must actually exercise the path
  }

  test("SimHash: identical texts at distance 0, near-dups close, distinct far") {
    val fp = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    assert(fp(1L) === fp(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("jaccard is exact set similarity") {
    val j = spark.range(1)
      .select(Dedup.jaccard(
        array(lit("a"), lit("b"), lit("c")),
        array(lit("b"), lit("c"), lit("d"))).as("j"))
      .collect().head.getDouble(0)
    assert(j === 0.5) // |{b,c}| / |{a,b,c,d}|
  }
}
