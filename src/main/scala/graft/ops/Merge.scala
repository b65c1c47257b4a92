package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyed MERGE (upsert/delete) over snapshot tables — the batch semantics
 * of `MERGE INTO` (Delta/Iceberg) and of a CDC changelog replay, as a
 * pure DataFrame transform: the caller owns where the result is written
 * (KeyedPartitionSink for partitioned parquet, JdbcUpsertSink for a
 * serving store — both already replay-idempotent).
 *
 * Two layers:
 *  - [[merge]]: apply a COMPACTED change set (≤ 1 row per key) — rows
 *    with op `D` delete, everything else upserts (replaces or inserts).
 *  - [[applyChangelog]]: first compact an ordered changelog (many events
 *    per key, strictly increasing `seqCol` within a key — a CDC stream's
 *    LSN) to its latest event per key, then [[merge]].
 *
 * Plan shape, sized for a 100 TB base + a small-fraction change batch
 * (the realistic CDC ratio): compaction is one shuffle on the CHANGE
 * set only (`row_number` desc + `rn = 1`, the rank filter Spark rewrites
 * into a per-partition top-1 via WindowGroupLimit — no full sort of any
 * key's history); the base table is touched by exactly one LEFT ANTI
 * join against the change KEYS (broadcast when the batch is small:
 * `broadcastChanges`), and untouched rows pass through byte-for-byte —
 * no per-column coalesce over the full base, which is what the
 * full-outer-join formulation of MERGE would do to every row.
 *
 * Contract: changelog columns minus (`seqCol`, `opCol`) must equal the
 * base schema (unionByName enforces it — a schema drift fails loudly,
 * not by silent column reorder).
 */
object Merge {

  /** Apply a compacted change set (≤ 1 row per key; op `D` = delete,
    * anything else = upsert). */
  def merge(base: DataFrame, changes: DataFrame, keys: Seq[String],
            opCol: String, broadcastChanges: Boolean = false): DataFrame = {
    val changeKeys0 = changes.select(keys.map(col): _*)
    val changeKeys = if (broadcastChanges) broadcast(changeKeys0) else changeKeys0
    val untouched = base.join(changeKeys, keys, "left_anti")
    val upserts = changes.filter(col(opCol) =!= "D").drop(opCol)
    untouched.unionByName(upserts)
  }

  /** Compact an ordered changelog to its latest event per key (strictly
    * increasing `seqCol` within a key — ties would make "latest"
    * undefined), then [[merge]]. */
  def applyChangelog(base: DataFrame, changelog: DataFrame,
                     keys: Seq[String], seqCol: String, opCol: String,
                     broadcastChanges: Boolean = false): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val latest = changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", seqCol)
    merge(base, latest, keys, opCol, broadcastChanges)
  }
}
