package graft

import org.apache.spark.sql.functions._

import graft.ops.Ols

/** Exact grouped OLS: known closed-form fits, degenerate denominators. */
class OlsSpec extends SparkSpec {
  import spark.implicits._

  test("exact fit on a known line (y = 3x + 2, no noise)") {
    val df = Seq((1L, 5L), (2L, 8L), (3L, 11L), (4L, 14L))
      .toDF("x", "y").withColumn("g", lit("l"))
    val r = Ols.groupedFit(df, col("g"), col("x"), col("y"))
      .collect().head
    val (sn, sd) = (BigInt(r.getAs[String]("slope_num")),
      BigInt(r.getAs[String]("slope_den")))
    val (in, id) = (BigInt(r.getAs[String]("icpt_num")),
      BigInt(r.getAs[String]("icpt_den")))
    assert(sn % sd === BigInt(0) && sn / sd === BigInt(3))
    assert(in % id === BigInt(0) && in / id === BigInt(2))
    assert(r.getAs[Long]("n") === 4L)
  }

  test("non-integral slope stays an exact rational (1/3)") {
    // points (0,0),(3,1): slope 1/3 exactly
    val df = Seq((0L, 0L), (3L, 1L)).toDF("x", "y")
      .withColumn("g", lit("r"))
    val r = Ols.groupedFit(df, col("g"), col("x"), col("y"))
      .collect().head
    val sn = BigInt(r.getAs[String]("slope_num"))
    val sd = BigInt(r.getAs[String]("slope_den"))
    assert(sn * 3 === sd) // num/den == 1/3 without ever dividing
  }

  test("single-valued x yields a ZERO denominator, not a fabricated fit") {
    val df = Seq((5L, 1L), (5L, 9L)).toDF("x", "y")
      .withColumn("g", lit("v"))
    val r = Ols.groupedFit(df, col("g"), col("x"), col("y"))
      .collect().head
    assert(BigInt(r.getAs[String]("slope_den")) === BigInt(0))
  }

  test("null x or y rows are excluded, groups stay independent") {
    val df = Seq(
      (Some(1L), Some(5L), "a"), (Some(2L), Some(8L), "a"),
      (None, Some(99L), "a"), (Some(7L), None, "a"),
      (Some(1L), Some(1L), "b"), (Some(2L), Some(2L), "b"))
      .toDF("x", "y", "g")
    val rows = Ols.groupedFit(df, col("g"), col("x"), col("y"))
      .orderBy("g").collect()
    assert(rows.map(_.getAs[Long]("n")).toSeq === Seq(2L, 2L))
    val a = rows.head
    // slope of (1,5),(2,8) is 3
    assert(BigInt(a.getAs[String]("slope_num")) ===
      BigInt(a.getAs[String]("slope_den")) * 3)
  }
}
