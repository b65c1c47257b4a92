package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.IncrementalAgg

/** Incremental aggregate maintenance: merging algebraic partials must
  * EQUAL the full recompute — including groups present on only one side —
  * and must not care how the history was batched (associativity). */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: DataFrame): Seq[String] =
    r.orderBy("k").collect().map(_.toString).toSeq

  private val data = Seq(
    ("a", 1.25), ("a", 2.50), ("a", -3.00),
    ("b", 10.00), ("b", 0.50),
    ("c", 7.75)).toDF("k", "v")

  test("merge(partials(old), partials(new)) == full recompute, disjoint groups included") {
    // split so 'a' straddles both batches, 'b' is old-only, 'c' new-only
    val old_ = data.filter(col("k") === "b" ||
      (col("k") === "a" && col("v") > 0))
    val neu = data.exceptAll(old_)
    val merged = IncrementalAgg.finalize(IncrementalAgg.merge(
      IncrementalAgg.partials(old_, Seq("k"), "v"),
      IncrementalAgg.partials(neu, Seq("k"), "v"), Seq("k")))
    val full = IncrementalAgg.finalize(
      IncrementalAgg.partials(data, Seq("k"), "v"))
    assert(rows(merged) === rows(full))
  }

  test("merge order/batching does not matter (associativity over 3 batches)") {
    val Array(b1, b2, b3) = data.randomSplit(Array(1, 1, 1), seed = 7)
    def p(df: DataFrame) = IncrementalAgg.partials(df, Seq("k"), "v")
    val leftFold = IncrementalAgg.merge(
      IncrementalAgg.merge(p(b1), p(b2), Seq("k")), p(b3), Seq("k"))
    val rightFold = IncrementalAgg.merge(
      p(b1), IncrementalAgg.merge(p(b2), p(b3), Seq("k")), Seq("k"))
    assert(rows(IncrementalAgg.finalize(leftFold)) ===
      rows(IncrementalAgg.finalize(rightFold)))
    assert(rows(IncrementalAgg.finalize(leftFold)) ===
      rows(IncrementalAgg.finalize(p(data))))
  }
}
