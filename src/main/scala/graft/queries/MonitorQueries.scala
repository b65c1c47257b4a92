package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{DataQuality, Trend, ZoneMap}

/**
 * q144-q149 — the statistical-monitoring tier: trend/changepoint/
 * autocorrelation detection over the day buckets ([[graft.ops.Trend]]),
 * layout-selectivity auditing ([[graft.ops.ZoneMap]]), fabricated-data
 * alarms ([[graft.ops.DataQuality.benfordProfile]]), and fuzzy record
 * linkage on the native `jaro_winkler` expression — the observability
 * layer a corpus warehouse runs on top of the daily aggregates the
 * reference's day-bucket queries produce (trends.go:279-406 groups by
 * the same −1h day buckets; this tier is what watches those series).
 */
object MonitorQueries {

  /** Shared daily series: events bucketed to (event_type, epoch day). */
  private def daily(spark: SparkSession, dir: String): DataFrame =
    Trend.dailyCounts(Tables.events(spark, dir), "event_type", "ts")

  private val dailySqlCte: String =
    """daily AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS x,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** q144 — exact OLS slope components per event type over the daily
    * series ([[Trend.olsSlope]]): n·Σxy − Σx·Σy and n·Σx² − (Σx)² in
    * BIGINT cross-multiplied form (the slope is their ratio; the
    * numerator's sign alone is the trend direction), so the trend
    * verdict hash-gates with no IEEE division anywhere. One hash agg
    * over the raw table + one over ~keys×days rows. */
  def q144TrendSlopes(spark: SparkSession, dir: String): DataFrame =
    Trend.olsSlope(daily(spark, dir), "event_type")
      .orderBy(col("event_type"))

  val q144Sql: String =
    s"""WITH $dailySqlCte,
       |s AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sx2
       |  FROM daily GROUP BY event_type)
       |SELECT event_type, n_days,
       |  CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
       |  CAST(n_days * sx2 - sx * sx AS BIGINT) AS slope_den,
       |  CASE WHEN n_days * sxy > sx * sy THEN 'up'
       |       WHEN n_days * sxy < sx * sy THEN 'down'
       |       ELSE 'flat' END AS direction
       |FROM s ORDER BY event_type""".stripMargin

  /** q145 — CUSUM changepoint per event type ([[Trend.cusumChangepoint]]):
    * the day where the cumulative mean-centered deviation peaks, kept
    * integral by n-scaling (cumᵢ = Σ n·yⱼ − T), ties to the earliest
    * day. Windows run on the keys×days daily table — metadata-scale. */
  def q145CusumChangepoint(spark: SparkSession, dir: String): DataFrame =
    Trend.cusumChangepoint(daily(spark, dir), "event_type")
      .orderBy(col("event_type"))

  val q145Sql: String =
    s"""WITH $dailySqlCte,
       |w AS (
       |  SELECT event_type, x, y,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
       |    CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS t
       |  FROM daily),
       |c AS (
       |  SELECT event_type, x, n, t,
       |    CAST(sum(n * y - t) OVER (PARTITION BY event_type ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS c
       |  FROM w),
       |r AS (
       |  SELECT event_type, n, t, x, abs(c) AS a,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY abs(c) DESC, x) AS rn
       |  FROM c)
       |SELECT event_type, n AS n_days, t AS total, x AS cp_day,
       |  CAST(a AS BIGINT) AS max_abs_cumdev
       |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** q146 — lag-{1,2,7} autocovariance components of the `click` daily
    * series ([[Trend.lagAutocov]]): pairs from a day+k self-equi-join
    * (true calendar lag — gaps pair with nothing, unlike a positional
    * LEAD), components as exact integer sums, the autocovariance
    * numerator's sign = the lag-k correlation sign. */
  def q146LagAutocov(spark: SparkSession, dir: String): DataFrame =
    Trend.lagAutocov(
        daily(spark, dir).filter(col("event_type") === "click"),
        Seq(1, 2, 7))
      .withColumnRenamed("lag", "lag_k")
      .orderBy(col("lag_k"))

  val q146Sql: String =
    """WITH daily AS (
      |  SELECT
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS x,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |p AS (
      |  SELECT l.k, a.y AS y1, b.y AS y2
      |  FROM (SELECT unnest([1, 2, 7]) AS k) l
      |  CROSS JOIN daily a
      |  JOIN daily b ON b.x = a.x + l.k)
      |SELECT CAST(k AS INTEGER) AS lag_k,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(y1) AS BIGINT) AS s1,
      |  CAST(sum(y2) AS BIGINT) AS s2,
      |  CAST(sum(y1 * y2) AS BIGINT) AS s12,
      |  CAST(count(*) * sum(y1 * y2) - sum(y1) * sum(y2) AS BIGINT)
      |    AS autocov_num
      |FROM p GROUP BY k ORDER BY lag_k""".stripMargin

  /** q147 — zone-map skip audit ([[ZoneMap]]): weekly ship-day zones of
    * lineitem (the time-partitioned-file layout) with min/max stats on
    * (ship_day, partkey), audited against the workload predicate
    * "shipped 1998-06-01..1998-08-31 AND partkey < 1000" — `skippable`
    * = the zone provably contains NO matching row, decided from the
    * stats table alone (O(zones), never re-touching data). One
    * map-side-combined hash agg builds the stats; the audit is a map
    * over ~360 rows. */
  def q147ZoneSkipAudit(spark: SparkSession, dir: String): DataFrame = {
    val shipDay = datediff(to_date(col("l_shipdate")),
      lit("1970-01-01").cast("date")).cast("long")
    val lo = datediff(lit("1998-06-01").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val hi = datediff(lit("1998-08-31").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val stats = ZoneMap.zoneStats(
      Tables.lineitem(spark, dir).withColumn("ship_day", shipDay),
      expr("ship_day DIV 7"),
      Seq("ship_day" -> col("ship_day"), "partkey" -> col("l_partkey")))
    ZoneMap.skipAudit(stats,
        col("max_ship_day") >= lo && col("min_ship_day") <= hi &&
          col("min_partkey") < 1000L)
      .orderBy(col("zone"))
  }

  val q147Sql: String =
    """WITH z AS (
      |  SELECT
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
      |      AS BIGINT) AS ship_day,
      |    l_partkey
      |  FROM lineitem),
      |s AS (
      |  SELECT ship_day // 7 AS zone,
      |    CAST(min(ship_day) AS BIGINT) AS min_ship_day,
      |    CAST(max(ship_day) AS BIGINT) AS max_ship_day,
      |    min(l_partkey) AS min_partkey,
      |    max(l_partkey) AS max_partkey,
      |    CAST(count(*) AS BIGINT) AS n_rows
      |  FROM z GROUP BY 1)
      |SELECT zone, min_ship_day, max_ship_day, min_partkey, max_partkey,
      |  n_rows,
      |  NOT (max_ship_day >=
      |         date_diff('day', DATE '1970-01-01', DATE '1998-06-01')
      |       AND min_ship_day <=
      |         date_diff('day', DATE '1970-01-01', DATE '1998-08-31')
      |       AND min_partkey < 1000) AS skippable
      |FROM s ORDER BY zone""".stripMargin

  /** q148 — Benford first-digit profile of l_extendedprice
    * ([[DataQuality.benfordProfile]]): exact counts + basis-point shares
    * with the digit extracted via fixed-point cents (one shared IEEE
    * multiply, no log10), shares as integer division — the classic
    * fabricated-amounts alarm, one map + one 9-key agg. */
  def q148Benford(spark: SparkSession, dir: String): DataFrame =
    DataQuality.benfordProfile(Tables.lineitem(spark, dir),
        col("l_extendedprice"))
      .orderBy(col("digit"))

  val q148Sql: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100)
      |    AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
      |  FROM lineitem),
      |g AS (
      |  SELECT digit, CAST(count(*) AS BIGINT) AS n
      |  FROM d WHERE digit >= 1 GROUP BY digit),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
      |SELECT digit, n, CAST((n * 10000) // total AS BIGINT) AS share_bp
      |FROM g CROSS JOIN t ORDER BY digit""".stripMargin

  /** q149 — fuzzy record linkage on part names: brand-blocked pairs
    * scored by the native [[graft.functions.JaroWinkler]] expression
    * (codegen'd, DuckDB-bit-identical kernel — gated here against
    * DuckDB's own jaro_winkler_similarity on every surviving pair),
    * kept at ≥ 0.94. Blocking bounds candidates to Σ block² like every
    * pair engine in the repo; the scorer itself never leaves
    * WholeStageCodegen. */
  def q149JwLinkage(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
    val a = p.select(col("p_brand").as("brand"),
      col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand").as("brand_b"),
      col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    a.join(b, col("brand") === col("brand_b") && col("key_a") < col("key_b"))
      .withColumn("jw", expr("jaro_winkler(name_a, name_b)"))
      .filter(col("jw") >= 0.94)
      .select(col("brand"), col("key_a"), col("key_b"), col("jw"))
      .orderBy(col("key_a"), col("key_b"))
  }

  val q149Sql: String =
    """SELECT a.p_brand AS brand, a.p_partkey AS key_a,
      |  b.p_partkey AS key_b,
      |  jaro_winkler_similarity(a.p_name, b.p_name) AS jw
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.94
      |ORDER BY key_a, key_b""".stripMargin

  // one zoned-layout write per (session, corpus) — the q112/PairStore
  // materialized-artifact pattern; the layout is the stored table, the
  // query is the steady-state read
  private val zonedStore =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def zonedPath(spark: SparkSession, dir: String): String =
    zonedStore.computeIfAbsent(
      spark.sparkContext.applicationId + "|" + dir,
      _ => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-zoned").toString
        graft.sources.ZonedCorpus.write(
          Tables.documents(spark, dir), tmp,
          expr("n_chars DIV 64"), Seq("doc_id", "n_chars"))
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
              .iterator().asScala.toSeq.reverse
              .foreach(java.nio.file.Files.deleteIfExists)
          } catch { case _: Throwable => () }
        }))
        tmp
      })

  /** q150 — zone-map-pruned scan through the custom DataSourceV2
    * connector ([[graft.sources.ZonedSource]]): documents re-laid-out
    * into n_chars zones of 64 (one-time artifact, session-memoized like
    * q112's buckets), then the steady-state read — a length-band slice
    * aggregated per source — planned through the manifest so only the
    * 2 overlapping zones of 9 are ever opened (ZonedSourceSpec asserts
    * the partition count; this gate asserts the rows). The oracle reads
    * the ORIGINAL parquet — a pruning bug that drops or duplicates rows
    * cannot hash-match. */
  def q150ZonedScan(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.ZonedSource")
      .load(zonedPath(spark, dir))
      .filter(col("n_chars") >= 256L && col("n_chars") <= 320L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"))

  val q150Sql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents
      |WHERE n_chars >= 256 AND n_chars <= 320
      |GROUP BY source ORDER BY source""".stripMargin
}
