package graft

import org.apache.spark.sql.functions._

import graft.ops.Merge

/** Keyed MERGE / changelog-replay semantics (ops/Merge). */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "v")

  test("merge: upsert replaces, insert appends, delete removes, rest untouched") {
    val changes = Seq(
      (2L, "B", 21.0, "U"),  // update
      (3L, "c", 30.0, "D"),  // delete
      (9L, "i", 90.0, "I")   // insert
    ).toDF("k", "name", "v", "op")
    val got = Merge.merge(base, changes, Seq("k"), "op",
        broadcastChanges = true)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0), (9L, "i", 90.0)))
  }

  test("applyChangelog: latest event per key wins; full lifecycle replays") {
    // key 2: update then delete; key 3: delete then re-insert; key 9:
    // insert then update — only the LAST event per key may apply
    val log = Seq(
      (2L, "B1", 21.0, "U", 1L), (2L, "B2", 22.0, "D", 2L),
      (3L, "c", 30.0, "D", 1L), (3L, "C", 33.0, "I", 2L),
      (9L, "i", 90.0, "I", 1L), (9L, "I", 99.0, "U", 2L)
    ).toDF("k", "name", "v", "op", "seq")
    val got = Merge.applyChangelog(base, log, Seq("k"), "seq", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, "a", 10.0), (3L, "C", 33.0), (4L, "d", 40.0), (9L, "I", 99.0)))
  }

  test("applyChangelog is idempotent: replaying the same batch is a no-op") {
    val log = Seq((2L, "B", 21.0, "U", 1L), (3L, "c", 30.0, "D", 1L))
      .toDF("k", "name", "v", "op", "seq")
    val once = Merge.applyChangelog(base, log, Seq("k"), "seq", "op")
    val twice = Merge.applyChangelog(once, log, Seq("k"), "seq", "op")
    assert(twice.orderBy("k").collect().toSeq ===
      once.orderBy("k").collect().toSeq)
  }

  test("schema drift in the change set fails loudly (unionByName)") {
    val drift = Seq((2L, 21.0, "U")).toDF("k", "v", "op") // 'name' missing
    intercept[org.apache.spark.sql.AnalysisException] {
      Merge.merge(base, drift, Seq("k"), "op").collect()
    }
  }
}
