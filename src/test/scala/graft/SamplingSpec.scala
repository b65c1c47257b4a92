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
}
