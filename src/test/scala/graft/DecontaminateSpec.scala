package graft

import org.apache.spark.sql.functions._

import graft.ops.Decontaminate

/** Decontaminate: only the TRAIN endpoint of a train×protected pair is
  * dropped — train×train pairs are benign, protected splits are frozen. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("drops train endpoints of cross pairs only; protected splits untouched") {
    // fixed split map: 1,2,3 train; 10 val; 20 test
    val splits = Map(1L -> "train", 2L -> "train", 3L -> "train",
      10L -> "val", 20L -> "test")
    def splitOf(c: org.apache.spark.sql.Column) = {
      splits.foldLeft(lit("train")) { case (acc, (id, s)) =>
        when(c === id, s).otherwise(acc)
      }
    }
    val docs = splits.keys.toSeq.map(id => (id, s"doc$id")).toDF("id", "text")
    val pairs = Seq(
      (1L, 2L),   // train x train: benign, nobody dropped
      (2L, 10L),  // train x val: drop 2
      (20L, 3L)   // test x train (reversed order): drop 3
    ).toDF("id_a", "id_b")
    val out = Decontaminate.dropContaminatedTrain(
        docs, "id", pairs, "id_a", "id_b", splitOf)
      .select("id").collect().map(_.getLong(0)).toSet
    // train survivors: 1 (its only pair is train x train)
    assert(out === Set(1L))
  }
}
