package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Joins, Sessionize}

/**
 * Round-4 analytics extensions: the time-series / corpus-statistics
 * operators a training-data pipeline leans on beyond dedup and ANN —
 * sessionization, interval joins, rolling windows, frequency analysis.
 * Every query here is oracle-gated (DuckDB twin on the same parquet).
 */
object AnalyticsQueries {

  /** q46 — BATCH sessionization (gaps-and-islands, 30-minute gap): the
    * batch twin of the streaming sessionizers. One shuffle on the key, one
    * sort, two window passes Catalyst fuses over the same spec. */
  def q46Sessionize(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(
        Tables.events(spark, dir).select(col("user_id"), col("ts")),
        "user_id", "ts", gapMinutes = 30)
      .orderBy(col("user_id"), col("session_start"))

  val q46Sql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |x AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_seq
      |  FROM x)
      |SELECT user_id, session_seq,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
      |FROM s
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_start""".stripMargin

  /** q47 — keyless INTERVAL JOIN: every `error` event opens a 15-minute
    * incident window; each non-error event counts the windows covering it.
    * The engine turns the inequality join into a bucketed equi-join
    * (Joins.intervalJoin) — the oracle is DuckDB's native IEJoin over the
    * raw inequality, an independent implementation of the semantics. */
  def q47IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val probes = ev.filter(col("event_type") =!= "error")
      .select(col("event_id"), col("ts"))
    val windows = ev.filter(col("event_type") === "error")
      .select(col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("w_end"))
    val matched = Joins.intervalJoin(probes, "ts", windows, "w_start", "w_end",
        bucketMicros = 15L * 60L * 1000000L)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_windows"))
    probes.select(col("event_id"))
      .join(matched, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"))
      .orderBy(col("event_id"))
  }

  val q47Sql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |w AS (
      |  SELECT ts AS w_start, ts + INTERVAL 15 MINUTE AS w_end
      |  FROM e WHERE event_type = 'error'),
      |p AS (SELECT event_id, ts FROM e WHERE event_type <> 'error')
      |SELECT p.event_id, count(w.w_start) AS n_windows
      |FROM p LEFT JOIN w ON p.ts >= w.w_start AND p.ts < w.w_end
      |GROUP BY p.event_id
      |ORDER BY event_id""".stripMargin
}
