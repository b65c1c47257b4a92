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

  test("auditAndClean: both outputs, one shared pinned pair stage") {
    val splits = Map(1L -> "train", 2L -> "train", 3L -> "train",
      10L -> "val", 20L -> "test")
    def splitOf(c: org.apache.spark.sql.Column) = {
      splits.foldLeft(lit("train")) { case (acc, (id, s)) =>
        when(c === id, s).otherwise(acc)
      }
    }
    val docs = splits.keys.toSeq.map(id => (id, s"doc$id")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (2L, 10L), (20L, 3L)).toDF("id_a", "id_b")
      .persist()
    try {
      pairs.count()
      val (matrix, cleaned) = Decontaminate.auditAndClean(
        docs, "id", pairs, "id_a", "id_b", splitOf)
      // matrix equals the q76 shape computed independently
      val m = matrix.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(m === Set(("train", "train", 1L), ("train", "val", 1L),
        ("test", "train", 1L)))
      // cleaned equals dropContaminatedTrain on the same pairs
      assert(cleaned.select("id").collect().map(_.getLong(0)).toSet
        === Set(1L))
      // one LSH pass: BOTH outputs' plans scan the SAME cached pair
      // relation — the composed path shares the pinned stage instead of
      // recomputing the pair pipeline per consumer
      def cacheIds(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
            r.cacheBuilder.cachedPlan.id
        }
      val ids = cacheIds(matrix) ++ cacheIds(cleaned)
      assert(ids.size === 2 && ids.distinct.size === 1,
        s"both consumers must read one shared cached pair stage: $ids")
    } finally pairs.unpersist(blocking = true)
  }
}
