package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic mixture construction: quota, weighted mixture, and the
  * pruned scale path, all exactly reproducible. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)
    .select($"source", $"doc_id")

  test("quotaSample: per-stratum caps respected, selection deterministic") {
    val s1 = Sampling.quotaSample(docs, "source", "doc_id", cap = 7)
    val s2 = Sampling.quotaSample(docs, "source", "doc_id", cap = 7)
    val a = s1.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a === s2.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    val perStratum = s1.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum.values.forall(_ <= 7))
    // every stratum smaller than the cap is taken whole
    val sizes = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(perStratum.getOrElse(src, 0L) === math.min(n, 7L), src)
    }
  }

  test("mixture: per-stratum quotas, absent strata dropped") {
    val srcs = docs.select($"source").distinct().as[String].collect().sorted
    val quotas = Map(srcs.head -> 3, srcs.last -> 5)
    val m = Sampling.mixture(docs, "source", "doc_id", quotas)
    val got = m.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === quotas.keySet)
    assert(got(srcs.head) === 3L && got(srcs.last) === 5L)
    // the quota-k selection is a prefix of the cap-k selection: same order
    val q = Sampling.quotaSample(docs, "source", "doc_id", cap = 5)
      .filter($"source" === srcs.last)
      .collect().map(_.getLong(1)).toSet
    assert(m.filter($"source" === srcs.last)
      .collect().map(_.getLong(1)).toSet === q)
  }

  test("quotaSamplePruned == quotaSample, including a margin that starves") {
    for (cap <- Seq(3, 20); margin <- Seq(4.0, 0.02)) {
      val exact = Sampling.quotaSample(docs, "source", "doc_id", cap)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val pruned = Sampling.quotaSamplePruned(docs, "source", "doc_id",
          cap, margin = margin)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(pruned === exact, s"cap=$cap margin=$margin")
    }
  }

  // --- rate-based sampling / fractional mixture ---------------------------

  test("rateSample: deterministic, monotone in rate, count near rate·n") {
    val n = 100000L
    val ids = spark.range(0, n).select($"id".as("doc_id"))
    Seq(0.1, 0.5, 0.9).foreach { rate =>
      val got = Sampling.rateSample(ids, "doc_id", rate).count()
      // the scramble is a fixed bijection of [0, 2^32): over a contiguous
      // id range the hit count concentrates tightly around rate·n — allow
      // 2% absolute slack (deterministic, so this either holds or never does)
      assert(math.abs(got.toDouble / n - rate) < 0.02,
        s"rate=$rate got=$got of $n")
    }
    // monotone: raising the rate only ADDS rows (threshold is a prefix)
    val lo = Sampling.rateSample(ids, "doc_id", 0.2)
      .collect().map(_.getLong(0)).toSet
    val hi = Sampling.rateSample(ids, "doc_id", 0.6)
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
    // boundary rates are exact
    assert(Sampling.rateSample(ids, "doc_id", 0.0).count() === 0L)
    assert(Sampling.rateSample(ids, "doc_id", 1.0).count() === n)
  }

  test("rateMixture: epochs = floor(rate) full copies + fractional partial") {
    val mixed = Sampling.rateMixture(docs, "source", "doc_id",
      Map("src0" -> 0.25, "src1" -> 1.0, "src2" -> 2.5, "src3" -> 0.0))
    val bySrc = mixed.groupBy($"source")
      .agg(count(lit(1)).as("n"), max($"epoch").as("max_e"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    val sizes = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate 1.0 → exactly one full epoch; rate 0 / absent strata → dropped
    assert(bySrc("src1") === (sizes("src1"), 1))
    assert(!bySrc.contains("src3"))
    assert(bySrc.keySet === Set("src0", "src1", "src2"))
    // rate 2.5 → every doc appears in epochs 1 and 2, a subset in epoch 3,
    // and the epoch-3 subset IS the rate-0.5 sample of that stratum
    val src2 = mixed.filter($"source" === "src2")
    assert(src2.filter($"epoch" <= 2).count() === 2 * sizes("src2"))
    val e3 = src2.filter($"epoch" === 3)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val half = Sampling.rateSample(docs.filter($"source" === "src2"),
      "doc_id", 0.5).select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(e3 === half)
    // rate 0.25 → single partial epoch, same membership as rateSample(0.25)
    val s0 = mixed.filter($"source" === "src0")
    assert(s0.agg(max($"epoch")).collect().head.getInt(0) === 1)
    val s0Ids = s0.select($"doc_id").collect().map(_.getLong(0)).toSet
    val quarter = Sampling.rateSample(docs.filter($"source" === "src0"),
      "doc_id", 0.25).select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(s0Ids === quarter)
  }
}
