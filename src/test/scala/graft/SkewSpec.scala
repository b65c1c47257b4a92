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
}
