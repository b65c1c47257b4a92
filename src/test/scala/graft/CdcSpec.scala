package graft

import org.apache.spark.sql.functions._

import graft.ops.Cdc

/** CDC changelog apply: last-writer-wins, tombstones, resurrection. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // (key, seq, tie, op, value)
  private lazy val changes = Seq(
    ("a", 1L, 1L, "U", 10L), ("a", 2L, 1L, "U", 20L),  // plain upserts
    ("b", 1L, 1L, "U", 30L), ("b", 2L, 1L, "D", 0L),   // ends deleted
    ("c", 1L, 1L, "D", 0L), ("c", 2L, 1L, "U", 40L),   // resurrected
    ("d", 5L, 1L, "U", 50L), ("d", 5L, 2L, "U", 60L)   // tie on seq, tie col decides
  ).toDF("k", "seq", "tie", "op", "v")

  private def applied: Map[String, (Long, Long, Long)] =
    Cdc.applyChangelog(changes, Seq("k"),
        Seq(col("seq"), col("tie")), col("op"), Seq("v" -> col("v")))
      .select("k", "n_changes", "v", "updated_at")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("last-writer-wins per key; updated_at is the winning seq") {
    assert(applied("a") === ((2L, 20L, 2L)))
    assert(applied("d") === ((2L, 60L, 5L)))
  }

  test("a key whose LAST change is a delete vanishes despite earlier upserts") {
    assert(!applied.contains("b"))
  }

  test("a delete overwritten by a later upsert resurrects") {
    assert(applied("c") === ((2L, 40L, 2L)))
  }

  test("result is a hash aggregate, not a window sort (plan shape)") {
    val plan = Cdc.applyChangelog(changes, Seq("k"),
      Seq(col("seq"), col("tie")), col("op"), Seq("v" -> col("v")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in CDC plan:\n$plan")
  }
}
