package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.CoreExprs
import graft.ops.Dedup

/**
 * Property-style equivalences over seeded random data (SURVEY §5 #3):
 * the argmax formulations, the pushdown range rewrite, and the Jaccard
 * size identity must agree on arbitrary inputs, not just fixtures.
 */
class EquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("argmax: struct-max ≡ max_by ≡ window row_number=1 on tie-free data") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // unique k per (group, row) → tie-free; payload arbitrary
      val rows = (0 until 300).map { i =>
        (s"g${rnd.nextInt(12)}", i * 1000 + rnd.nextInt(999), s"p$i")
      }
      val df = rows.toDF("g", "k", "p")
      val viaStruct = df.groupBy($"g").agg(max(struct($"k", $"p")).as("m"))
        .select($"g", $"m.p").as[(String, String)].collect().toMap
      val viaMaxBy = df.groupBy($"g").agg(max_by($"p", $"k").as("p"))
        .as[(String, String)].collect().toMap
      val viaWindow = df.withColumn("rn",
          row_number().over(Window.partitionBy($"g").orderBy($"k".desc)))
        .filter($"rn" === 1).select($"g", $"p")
        .as[(String, String)].collect().toMap
      assert(viaStruct === viaMaxBy, s"seed $seed")
      assert(viaStruct === viaWindow, s"seed $seed")
    }
  }

  test("dayBucketEquals range form ≡ to_date(ts − 1h) = D on random timestamps") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2023-03-09 22:00:00").getTime
      // cluster timestamps around the day boundary ±3h in odd-second steps
      val ts = (0 until 500).map { _ =>
        new Timestamp(base + rnd.nextInt(6 * 3600) * 1000L + rnd.nextInt(1000))
      }
      val df = ts.toDF("ts")
      val range = df.filter(CoreExprs.dayBucketEquals($"ts", "2023-03-10"))
        .collect().map(_.getTimestamp(0)).toSet
      val naive = df.filter(CoreExprs.dayBucket($"ts") === lit("2023-03-10"))
        .collect().map(_.getTimestamp(0)).toSet
      assert(range === naive, s"seed $seed")
    }
  }

  test("jaccard: |∩|/(|A|+|B|−|∩|) ≡ |∩|/|∪| on random string sets") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 60L).map { i =>
      i -> (0 until (1 + rnd.nextInt(20))).map(_ => s"w${rnd.nextInt(30)}")
        .mkString(" ")
    }.toDF("doc_id", "text")
    val bySize = Dedup.ngramJaccardPairs(
        docs.withColumn("all", lit(1)), "doc_id", "text", "all",
        n = 1, threshold = 0.0)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val byUnion = {
      val sh = docs.select($"doc_id",
        array_distinct(Dedup.shingles($"text", 1)).as("s"))
      val a = sh.select($"doc_id".as("id_a"), $"s".as("sa"))
      val b = sh.select($"doc_id".as("id_b"), $"s".as("sb"))
      a.crossJoin(b).filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b", Dedup.jaccard($"sa", $"sb").as("j"))
        .filter($"j" > 0.0)
        .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    }
    // same overlapping-pair set, bit-identical values where present
    assert(bySize.filter(_._2 > 0.0).keySet === byUnion.keySet)
    byUnion.foreach { case (k, v) =>
      if (v > 0.0)
        assert(java.lang.Double.doubleToLongBits(bySize(k)) ===
          java.lang.Double.doubleToLongBits(v), s"pair $k")
    }
  }
}
