package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * CDC changelog apply — materialize the FINAL table state from a stream
 * of keyed change events (upserts + delete tombstones), the compaction
 * every lakehouse CDC sink (Debezium → Delta/Iceberg MERGE) runs:
 * last-writer-wins per key under a total sequence order, tombstoned keys
 * absent from the result.
 *
 * Shape: ONE hash aggregate — `max(struct(seq…, op, values…))` picks
 * each key's latest change (struct ordering compares the sequence fields
 * first; the caller supplies a TOTAL order, e.g. (ts, event_id)), with
 * map-side combine doing most of the collapse before the shuffle. No
 * window (`row_number() PARTITION BY key` would shuffle full rows to
 * sort groups the aggregate never needs), no join, shuffle mass =
 * #distinct keys. The tombstone filter runs AFTER the argmax — a key
 * whose LAST change is a delete vanishes even though earlier upserts
 * exist, and a delete overwritten by a later upsert resurrects.
 */
object Cdc {

  /**
   * One row per surviving key: key columns, `n_changes` (audit count of
   * changelog entries seen for the key), each value column at its
   * latest state, and `updated_at` = the winning sequence value (first
   * seq column). `opCol` must evaluate to "D" for deletes; anything
   * else is an upsert.
   */
  def applyChangelog(changes: DataFrame, keyCols: Seq[String],
                     seqCols: Seq[Column], opCol: Column,
                     valueCols: Seq[(String, Column)]): DataFrame = {
    val winner = struct(
      seqCols.zipWithIndex.map { case (c, i) => c.as(s"__s$i") } ++
        (opCol.as("__op") +:
          valueCols.map { case (n, c) => c.as(n) }): _*)
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(max(winner).as("__w"), count(lit(1)).as("n_changes"))
      .filter(col("__w.__op") =!= "D")
      .select(keyCols.map(col) ++ Seq(col("n_changes")) ++
        valueCols.map { case (n, _) => col(s"__w.$n").as(n) } :+
        col("__w.__s0").as("updated_at"): _*)
  }
}
