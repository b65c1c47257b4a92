package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * BATCH sessionization — the gaps-and-islands twin of the streaming
 * sessionizers (`streaming/EventStreams.sessionize*`): group each key's
 * events into sessions separated by inactivity gaps longer than
 * `gapMinutes`.
 *
 * Plan shape: ONE shuffle on the key, then two window passes over the SAME
 * (partition, order) spec — Catalyst plans them into a single sort, so the
 * whole op is exchange + sort + linear scan + a partial-aggregated groupBy
 * that reuses the clustering. Nothing quadratic, nothing driver-side.
 *
 * Scale note: like any per-key ordered scan, the window partitions on the
 * bare key, so one mega-key serializes one reducer. Session semantics are
 * inherently sequential per key (a session may chain across any time
 * bucket, so the (key, bucket) two-phase trick of
 * [[Joins.asofJoinBucketed]] needs an iterated boundary-merge to be exact);
 * for unbounded keys use the streaming path, whose state store bounds
 * per-key memory. Equal timestamps are safe: a zero gap never starts a new
 * session regardless of tie order, so the session assignment — and
 * everything derived from it — is deterministic even though the sort order
 * of ties is not.
 */
object Sessionize {

  /**
   * One row per (key, session): `session_seq` (1-based per key, in time
   * order), `session_start`/`session_end` (min/max event time),
   * `n_events`, `duration_us`.
   */
  /**
   * Per-EVENT session labeling: the input rows plus `session_seq`
   * (1-based per key, in time order). `tieCol` makes the ordering total so
   * downstream per-session sequences (e.g. path extraction) are
   * deterministic; the session ASSIGNMENT itself is tie-safe either way
   * (zero gap never breaks a session).
   */
  def eventSessions(events: DataFrame, keyCol: String, timeCol: String,
                    gapMinutes: Int, tieCol: String): DataFrame = {
    val key = col(keyCol)
    val ts = col(timeCol)
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy(key).orderBy(ts, col(tieCol))
    val prev = lag(ts, 1).over(w)
    val brk = when(prev.isNull ||
      unix_micros(ts) - unix_micros(prev) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("__brk", brk)
      .withColumn("session_seq", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk")
  }

  def sessions(events: DataFrame, keyCol: String, timeCol: String,
               gapMinutes: Int = 30): DataFrame = {
    val key = col(keyCol)
    val ts = col(timeCol)
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy(key).orderBy(ts)
    val prev = lag(ts, 1).over(w)
    // a session break is "no previous event" or "gap strictly over the cap"
    val brk = when(prev.isNull ||
      unix_micros(ts) - unix_micros(prev) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("__brk", brk)
      .withColumn("session_seq", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(key, col("session_seq"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
  }
}
