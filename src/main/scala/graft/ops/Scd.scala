package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension (SCD Type 2) construction and snapshot
 * diffing — the two halves of warehouse dimension maintenance: turn a
 * change stream into validity-interval history, and turn two table
 * snapshots into the change stream.
 *
 * Scale shape: `scd2` is one shuffle on the key + one window pass
 * (lag-dedup and lead-close share the same (key | time) sort, so Catalyst
 * runs them in a single Window operator); `snapshotDiff` is one full outer
 * hash join comparing 48-bit row digests ([[Checksum.rowDigest]]) instead
 * of every column — wide rows compare in O(1) per row and the join carries
 * only key + digest + payload columns the caller asked to keep.
 */
object Scd {

  /**
   * Compress an ordered change stream into SCD2 validity intervals: one
   * row per (key, state run) with `valid_from` (inclusive), `valid_to`
   * (exclusive, null = current) and `is_current`. Consecutive events with
   * the SAME state collapse into one interval (true SCD2 semantics — a
   * re-stated value is not a new version). `tieCol` totalizes the
   * ordering so runs are deterministic under equal timestamps.
   */
  def scd2(changes: DataFrame, keyCol: String, timeCol: String,
           stateCol: String, tieCol: String): DataFrame = {
    val key = col(keyCol); val ts = col(timeCol); val st = col(stateCol)
    val w = Window.partitionBy(key).orderBy(ts, col(tieCol))
    // run boundary: first event of the key, or state differs from the
    // previous event (null-safe <=>: NULL->'x' and 'x'->NULL both count)
    val runStart = changes
      .withColumn("__prev_state", lag(st, 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(st <=> col("__prev_state")))
      .drop("__prev_state", "__rn")
    val w2 = Window.partitionBy(key).orderBy(ts, col(tieCol))
    runStart
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(timeCol)
  }

  /**
   * Diff two snapshots of a keyed table into a changelog: `op` ∈
   * insert / delete / update, detected by comparing [[Checksum.rowDigest]]
   * over `payloadCols` — ONE full outer join on the key, O(1) row compare
   * regardless of width. Unchanged rows are dropped before anything wide
   * is carried.
   */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    val digest = Checksum.rowDigest(payloadCols.map(col))
    val b = before.select(col(keyCol).as("__k"), digest.as("__dig_b"))
    val a = after.select(Seq(col(keyCol).as("__k"), digest.as("__dig_a")) ++
      payloadCols.map(col): _*)
    b.join(a, Seq("__k"), "full_outer")
      .withColumn("op",
        when(col("__dig_b").isNull, "insert")
          .when(col("__dig_a").isNull, "delete")
          .when(col("__dig_a") =!= col("__dig_b"), "update"))
      .filter(col("op").isNotNull)
      .select(Seq(col("__k").as(keyCol), col("op")) ++
        payloadCols.map(col): _*)
  }
}
