package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.WeightedMedian

/** The distributed per-group weighted lower median (q161's engine):
  * hand-pinned edges plus exact parity with the naive
  * `PARTITION BY group` window twin on random data under scrambled
  * partitioning — the twin is the semantics, the scaffold is the scale
  * shape. */
class WeightedMedianSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Long)] =
    WeightedMedian.lowerMedian(
        rows.toDF("g", "v", "w").repartition(7), "g", "v", "w")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("odd total: the middle unit's value") {
    // g: 1×w2, 5×w1 → total 3, first v with 2·cum ≥ 3 is v=1 (cum 2)
    assert(run(Seq(("g", 1L, 2L), ("g", 5L, 1L))) === Map("g" -> ((1L, 3L))))
  }

  test("even split: lower median (first value reaching exactly half)") {
    // 1×w1, 9×w1 → total 2; v=1 has 2·1 ≥ 2 → lower median 1
    assert(run(Seq(("g", 1L, 1L), ("g", 9L, 1L))) === Map("g" -> ((1L, 2L))))
  }

  test("duplicate values collapse into one weight") {
    assert(run(Seq(("g", 3L, 1L), ("g", 3L, 1L), ("g", 9L, 1L))) ===
      Map("g" -> ((3L, 3L))))
  }

  test("groups are independent") {
    assert(run(Seq(("a", 1L, 1L), ("a", 100L, 5L),
      ("b", 7L, 3L), ("b", 900L, 1L))) ===
      Map("a" -> ((100L, 6L)), "b" -> ((7L, 4L))))
  }

  test("matches the PARTITION BY window twin on random groups") {
    val rnd = new scala.util.Random(43)
    val rows = for {
      g <- Seq("a", "b", "c", "d", "e", "f", "gg", "h")
      _ <- 1 to 200
    } yield (g, rnd.nextInt(50).toLong, rnd.nextInt(5).toLong + 1L)
    val got = run(rows)
    val df = rows.toDF("g", "v", "w")
      .groupBy(col("g"), col("v")).agg(sum(col("w")).as("w"))
    val twin = df
      .withColumn("total", sum(col("w")).over(Window.partitionBy(col("g"))))
      .withColumn("cw", sum(col("w")).over(Window.partitionBy(col("g"))
        .orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cw") * 2 >= col("total"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("m"), max(col("total")).as("t"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === twin)
  }
}
