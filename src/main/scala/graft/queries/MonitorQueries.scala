package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CacheScope, DataQuality, Trend, ZoneMap}

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
      // a lag with ZERO calendar pairs yields an all-null aggregate row
      // in Spark but no group in the oracle's GROUP BY — emit neither
      .filter(col("n_pairs") > 0)
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
      |  SELECT TRY_CAST(substr(CAST(CAST(round(l_extendedprice * 100)
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
      // content-fingerprinted like PairStore: regenerating the documents
      // parquet in-session must never serve a layout built from the old
      // snapshot (the metadata-only q181 would silently answer stale)
      spark.sparkContext.applicationId + "|" + dir + "|" +
        PairStore.snapshotFingerprint(dir),
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

  /** q151 — the first 3 BPE merge rounds (Sennrich et al. '16) over the
    * corpus vocabulary: per round, the most frequent adjacent symbol
    * pair (weighted by word frequency, ties to the lexicographically
    * smallest pair) is merged leftmost-non-overlapping into the vocab
    * and the count table rebuilt. 100 TB shape: ONE corpus-scale hash
    * agg reduces text to the (word, freq) vocab; every round after that
    * runs on vocab rows (bounded by the token vocabulary, not the
    * corpus) with a single-row driver fetch per round — the exact
    * structure of production BPE trainers. The merge application is an
    * exact array fold; the oracle reaches the same fold via two
    * delimiter-sentinel string-replace passes (pass 1 takes every other
    * occurrence in a contiguous run — the consumed-boundary case —
    * pass 2 the rest). */
  def q151BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = filter(split(lower(col("text")), "[^a-z]+"),
      t => length(t) > 0)
    val vocab0 = Tables.documents(spark, dir)
      .select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("syms"), col("freq"))
      .persist()
    try graft.ops.Bpe.mergeRounds(vocab0, k = 3)
      .toDF("step", "sym_a", "sym_b", "pair_count")
      .orderBy(col("step"))
    finally vocab0.unpersist(blocking = false)
  }

  val q151Sql: String = {
    // one round of CTEs: pairs of roundN-1's vocab, argmax, merge applied
    def round(n: Int, prev: String): String =
      s"""p$n AS (
         |  SELECT l[g] AS a, l[g + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM $prev, UNNEST(generate_series(1, len(l) - 1)) AS u(g)
         |  GROUP BY 1, 2),
         |m$n AS (SELECT a, b, cnt FROM p$n ORDER BY cnt DESC, a, b LIMIT 1),
         |v$n AS (
         |  SELECT list_filter(string_split(replace(replace(
         |      ' ' || array_to_string(l, ' ') || ' ',
         |      ' ' || m$n.a || ' ' || m$n.b || ' ',
         |      ' ' || m$n.a || m$n.b || ' '),
         |      ' ' || m$n.a || ' ' || m$n.b || ' ',
         |      ' ' || m$n.a || m$n.b || ' '), ' '),
         |      x -> x <> '') AS l, freq
         |  FROM $prev CROSS JOIN m$n)""".stripMargin
    """WITH w AS (
      |  SELECT t AS w, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(list_filter(
      |      regexp_split_to_array(lower(text), '[^a-z]+'),
      |      x -> x <> '')) AS t FROM documents)
      |  GROUP BY 1),
      |v0 AS (
      |  SELECT list_transform(range(length(w)), i -> w[i + 1]) AS l, freq
      |  FROM w),
      |""".stripMargin +
      round(1, "v0") + ",\n" + round(2, "v1") + ",\n" + round(3, "v2") +
      """
        |SELECT CAST(1 AS INTEGER) AS step, a AS sym_a, b AS sym_b,
        |  cnt AS pair_count FROM m1
        |UNION ALL SELECT 2, a, b, cnt FROM m2
        |UNION ALL SELECT 3, a, b, cnt FROM m3
        |ORDER BY step""".stripMargin
  }

  /** q152 — merged-interval coverage per user (the classic
    * gaps-and-islands reduction): each event opens a 90-second
    * activity window; overlapping windows merge, and the query reports
    * islands and total covered time in EXACT microseconds. One
    * partitioned sort feeds both windows; arithmetic never leaves
    * BIGINT epoch-micros. */
  def q152IntervalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e"))
      .over(win.rowsBetween(Long.MinValue, -1))
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("s"))
      .withColumn("e", col("s") + 90L * 1000000L)
      .withColumn("new_island",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(win.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("i_start"), max(col("e")).as("i_end"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start")).as("covered_us"))
      .orderBy(col("user_id"))
  }

  val q152Sql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 90000000 AS e
      |  FROM events),
      |m AS (
      |  SELECT user_id, s, e,
      |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM iv),
      |isl AS (
      |  SELECT user_id, s, e,
      |    CAST(sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY s, e
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS island
      |  FROM m),
      |g AS (
      |  SELECT user_id, island, min(s) AS i_start, max(e) AS i_end
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_islands,
      |  CAST(sum(i_end - i_start) AS BIGINT) AS covered_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q153 — token-concentration (Simpson index) quality gate: per doc,
    * Σc² over token counts c against n² total-pairs — the
    * degenerate-repetition alarm — stated as exact integers (the IEEE
    * entropy variant can't hash-gate; the concentration index can).
    * The per-doc count happens MAP-SIDE: sort the token array, fold
    * counting runs (zero shuffle — the q54 lesson as an array
    * aggregate); one tiny per-source agg follows. Flagged docs have
    * concentration ≥ 1/4 (4·Σc² ≥ n²). */
  def q153TokenConcentration(spark: SparkSession,
                             dir: String): DataFrame = {
    val toksSorted = array_sort(filter(split(lower(col("text")),
      "[^a-z]+"), t => length(t) > 0))
    val emptyState = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("ss"))
    val ss = aggregate(toksSorted, emptyState,
      (acc, t) => when(t === acc.getField("prev"),
          struct(t.as("prev"), (acc.getField("run") + 1L).as("run"),
            acc.getField("ss").as("ss")))
        .otherwise(struct(t.as("prev"), lit(1L).as("run"),
          (acc.getField("ss") +
            acc.getField("run") * acc.getField("run")).as("ss"))),
      acc => acc.getField("ss") +
        acc.getField("run") * acc.getField("run"))
    Tables.documents(spark, dir)
      .select(col("source"), size(toksSorted).cast("long").as("n"),
        ss.as("ss"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ss")).as("sum_ss"),
        sum(col("n") * col("n")).as("sum_n2"),
        sum(when(lit(4L) * col("ss") >= col("n") * col("n") &&
          col("n") > 0L, 1L).otherwise(0L)).as("n_concentrated"))
      .orderBy(col("source"))
  }

  val q153Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'),
      |    x -> x <> '')) AS t
      |  FROM documents),
      |c AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
      |d AS (
      |  SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS ss,
      |    CAST(sum(c) AS BIGINT) AS n
      |  FROM c GROUP BY 1)
      |SELECT doc.source, count(*) AS n_docs,
      |  CAST(sum(coalesce(d.ss, 0)) AS BIGINT) AS sum_ss,
      |  CAST(sum(coalesce(d.n, 0) * coalesce(d.n, 0)) AS BIGINT)
      |    AS sum_n2,
      |  CAST(sum(CASE WHEN 4 * coalesce(d.ss, 0) >=
      |      coalesce(d.n, 0) * coalesce(d.n, 0)
      |      AND coalesce(d.n, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_concentrated
      |FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q154 — one EXACT Lloyd (k-means) step on the embeddings: vectors
    * fixed-pointed to integers (round(x·2¹⁵) — ×2¹⁵ is exact in IEEE, so
    * both engines round the same double), assigned to the k=8 seed
    * centroids (vec_id 0..7) by exact integer squared distance (ties to
    * the lowest centroid), and the NEW centroids reported as exact sums
    * (n_members + Σq component checksums) — the update step before the
    * one division k-means ever needs. Assignment is map-side (the 8
    * centroids broadcast); one hash agg follows — the canonical
    * distributed-k-means round shape. */
  def q154LloydStep(spark: SparkSession, dir: String): DataFrame = {
    val quant = transform(col("embedding"),
      x => round(x.cast("double") * 32768).cast("long"))
    val pts = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quant.as("q"))
    val cents = pts.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    val d2 = aggregate(
      zip_with(col("q"), col("cq"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val best = pts.crossJoin(broadcast(cents))
      .select(col("vec_id"), struct(d2.as("d2"), col("cid").as("cid"))
        .as("cand"))
      .groupBy(col("vec_id"))
      .agg(min(col("cand")).getField("cid").as("cluster"))
    best.join(pts, "vec_id")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(aggregate(col("q"), lit(0L), (acc, x) => acc + x))
          .as("sum_q"),
        sum(element_at(col("q"), 1)).as("sum_q0"),
        sum(aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
          .as("sum_q2"))
      .orderBy(col("cluster"))
  }

  val q154Sql: String =
    """WITH q AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 32768) AS BIGINT)) AS q
      |  FROM embeddings),
      |c AS (SELECT vec_id AS cid, q AS cq FROM q WHERE vec_id < 8),
      |d AS (
      |  SELECT q.vec_id, c.cid,
      |    CAST(list_sum(list_transform(range(64),
      |      i -> (q.q[i + 1] - c.cq[i + 1]) * (q.q[i + 1] - c.cq[i + 1])))
      |      AS BIGINT) AS d2
      |  FROM q CROSS JOIN c),
      |a AS (
      |  SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |  FROM d),
      |j AS (SELECT a.cid, q.q FROM a JOIN q USING (vec_id) WHERE rn = 1)
      |SELECT cid AS cluster, count(*) AS n_members,
      |  CAST(sum(CAST(list_sum(q) AS BIGINT)) AS BIGINT) AS sum_q,
      |  CAST(sum(q[1]) AS BIGINT) AS sum_q0,
      |  CAST(sum(CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT))
      |    AS BIGINT) AS sum_q2
      |FROM j GROUP BY cid ORDER BY cluster""".stripMargin

  /** q156 — source vocabulary-overlap matrix: for every source pair, the
    * exact distinct-token intersection and both vocabulary sizes, plus
    * the overlap coefficient as one final division — the "are these two
    * crawls the same corpus" provenance signal at SOURCE granularity
    * (q126 gives it at document granularity). The (source, token)
    * reduce is a hash aggregate whose key space is sources × vocabulary
    * — bounded by the LANGUAGE, not the corpus — and the self-join runs
    * on that reduced table. */
  def q156VocabOverlap(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "[^a-z]+"),
      t => length(t) > 0)
    val st = Tables.documents(spark, dir)
      .select(col("source"), explode(array_distinct(toks)).as("t"))
      .distinct()
    CacheScope.withStages(st) {
      val sizes = st.groupBy(col("source"))
        .agg(count(lit(1)).as("vocab"))
      val inter = st.select(col("source").as("source_a"), col("t"))
        .join(st.select(col("source").as("source_b"), col("t")), "t")
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("inter"))
      CacheScope.pin(inter
        .join(sizes.select(col("source").as("source_a"),
          col("vocab").as("vocab_a")), "source_a")
        .join(sizes.select(col("source").as("source_b"),
          col("vocab").as("vocab_b")), "source_b")
        .select(col("source_a"), col("source_b"), col("vocab_a"),
          col("vocab_b"), col("inter"),
          (col("inter").cast("double") /
            least(col("vocab_a"), col("vocab_b")).cast("double"))
            .as("overlap_coef"))
        .orderBy(col("source_a"), col("source_b")))
    }
  }

  val q156Sql: String =
    """WITH st AS (
      |  SELECT DISTINCT source, unnest(list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'),
      |    x -> x <> '')) AS t
      |  FROM documents),
      |sz AS (SELECT source, count(*) AS vocab FROM st GROUP BY source),
      |iv AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    count(*) AS inter
      |  FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b,
      |  za.vocab AS vocab_a, zb.vocab AS vocab_b, inter,
      |  CAST(inter AS DOUBLE) / CAST(least(za.vocab, zb.vocab) AS DOUBLE)
      |    AS overlap_coef
      |FROM iv
      |JOIN sz za ON iv.source_a = za.source
      |JOIN sz zb ON iv.source_b = zb.source
      |ORDER BY source_a, source_b""".stripMargin

  /** q157 — cumulative-distinct growth curve: per day, NEW users (first
    * ever appearance) and the exact running distinct-user total — the
    * audience/corpus growth report. A running COUNT(DISTINCT) is
    * unbounded state done naively; reduced to first-appearance day it is
    * one user-keyed hash agg + a cumulative window over ≤ days rows —
    * bounded by the CALENDAR (a decade is ~3.7k rows), so the
    * single-partition window is metadata-sized by construction, unlike
    * the distinct-VALUE domains that moved to TwoPhaseScan.cumSums. */
  def q157DistinctGrowth(spark: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(Long.MinValue, 0)
    firstDay
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  val q157Sql: String =
    """WITH f AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS day
      |  FROM events GROUP BY user_id),
      |d AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
      |SELECT day, new_users,
      |  CAST(sum(new_users) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_users
      |FROM d ORDER BY day""".stripMargin

  /** q158 — deterministic systematic sample by cumulative weight: order
    * the corpus by doc_id, lay documents along the exact n_chars prefix
    * sum, and select every document whose interval contains a multiple
    * of step = total DIV 50 — the classic probability-proportional-to-
    * size systematic design, with ZERO randomness state (reproducible
    * from the data alone). The prefix sum is [[graft.ops.Packing]]'s
    * two-phase distributed scan (no single-reducer window); the oracle
    * is the naive global-window plan in DuckDB. Selection arithmetic is
    * all-integer: first multiple ≥ start is ((start+step−1) DIV
    * step)·step, selected iff it lands before start+weight. */
  def q158SystematicSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    // total comes from the pack's own per-partition sums pass — no
    // separate corpus aggregate (and no head() to NPE on an empty table)
    val (packed, total) = graft.ops.Packing.packByBudgetWithTotal(docs,
      col("n_chars"), tot => math.max(1L, tot / 50L), col("doc_id"))
    val step = math.max(1L, total / 50L)
    packed
      .filter(expr(s"((running_start + ${step}L - 1) DIV ${step}L) " +
        s"* ${step}L < running_start + n_chars"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("running_start"))
      .orderBy(col("doc_id"))
  }

  /** q159 — language-model scoring of a held-out slice: a Kneser-Ney
    * bigram model ([[graft.ops.NgramLm]], the q91 estimator) trains on
    * every source EXCEPT src0, and each src0 document is scored over its
    * bigram occurrences — the perplexity-filtering pass of a data
    * pipeline, stated hash-gateably: each bigram's pkn is the gated
    * fixed IEEE sequence, fixed-pointed per bigram (floor(pkn·10⁹) — one
    * more shared IEEE op), so the per-doc SCORE is an exact integer sum,
    * immune to float summation order. OOV bigrams are counted, not
    * scored. Model is |V|²-bounded → broadcast; scoring is map-side. */
  def q159LmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val model = graft.ops.NgramLm
      .kneserNeyBigrams(docs.filter(col("source") =!= "src0"), "text")
      .select(col("w1"), col("w2"),
        floor(col("pkn") * 1e9).cast("long").as("p_fp"))
    val t = filter(split(lower(col("text")), "[^a-z]+"),
      x => length(x) > 0)
    val bi = when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("w1"),
            element_at(t, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    docs.filter(col("source") === "src0")
      .select(col("doc_id"), explode(bi).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .join(broadcast(model), Seq("w1", "w2"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("p_fp").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("p_fp"), lit(0L))).as("score_fp"))
      .orderBy(col("doc_id"))
  }

  val q159Sql: String =
    """WITH t AS (
      |  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
      |    x -> length(x) > 0) AS toks
      |  FROM documents WHERE source <> 'src0'),
      |bi AS (
      |  SELECT toks[g] AS w1, toks[g+1] AS w2
      |  FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(g)
      |  WHERE len(toks) >= 2),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
      |byw1 AS (
      |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1p_w1
      |  FROM c12 GROUP BY w1),
      |byw2 AS (SELECT w2, count(*) AS n1p_cont FROM c12 GROUP BY w2),
      |tot AS (SELECT count(*) AS n1p_total FROM c12),
      |model AS (
      |  SELECT w1, w2,
      |    CAST(floor((greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
      |        / CAST(c1 AS DOUBLE)
      |      + (0.75 * CAST(n1p_w1 AS DOUBLE) / CAST(c1 AS DOUBLE))
      |        * (CAST(n1p_cont AS DOUBLE) / CAST(n1p_total AS DOUBLE)))
      |      * 1e9) AS BIGINT) AS p_fp
      |  FROM c12 JOIN byw1 USING (w1) JOIN byw2 USING (w2)
      |  CROSS JOIN tot),
      |ev AS (
      |  SELECT doc_id, toks[g] AS w1, toks[g+1] AS w2
      |  FROM (SELECT doc_id,
      |          list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
      |            x -> length(x) > 0) AS toks
      |        FROM documents WHERE source = 'src0') e,
      |    UNNEST(generate_series(1, len(toks) - 1)) AS u(g)
      |  WHERE len(toks) >= 2)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(CASE WHEN p_fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  CAST(sum(coalesce(p_fp, 0)) AS BIGINT) AS score_fp
      |FROM ev LEFT JOIN model USING (w1, w2)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q160 — late-event watermark accounting (the batch twin of
    * Structured Streaming's watermark bookkeeping): events arrive in
    * event_id order; an event is LATE if its event time trails the
    * high-water mark of everything that arrived before it by more than
    * the 10-minute allowed lateness — exactly the rows a watermarked
    * streaming agg would drop. Reported per event-time day: events,
    * late events, max lateness (exact micros). The running maximum over
    * the GLOBAL arrival order is [[graft.ops.PrefixScan]]'s two-phase
    * scan — the naive `max OVER (ORDER BY …)` single-reducer window is
    * the oracle's job, not the engine's. */
  def q160WatermarkAccounting(spark: SparkSession,
                              dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("ts_us"))
    val scanned = graft.ops.PrefixScan.exclusiveRunningMax(
      ev, col("ts_us"), "hwm_us", col("event_id"))
    val lateness = col("hwm_us") - lit(600L * 1000000L) - col("ts_us")
    scanned
      .withColumn("late_us",
        when(col("hwm_us").isNotNull && lateness > 0L, lateness)
          .otherwise(lit(0L)))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"))
      .orderBy(col("day"))
  }

  val q160Sql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS ts_us
      |  FROM events),
      |h AS (
      |  SELECT day, ts_us,
      |    max(ts_us) OVER (ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm_us
      |  FROM e),
      |l AS (
      |  SELECT day,
      |    CASE WHEN hwm_us IS NOT NULL
      |        AND hwm_us - 600000000 - ts_us > 0
      |      THEN hwm_us - 600000000 - ts_us ELSE 0 END AS late_us
      |  FROM h)
      |SELECT day, count(*) AS n_events,
      |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_late,
      |  CAST(max(late_us) AS BIGINT) AS max_late_us
      |FROM l GROUP BY day ORDER BY day""".stripMargin

  /** q161 — exact weighted (lower) median: per return flag, the
    * smallest price-in-cents whose cumulative quantity reaches half the
    * flag's total — all-integer (2·cum ≥ total avoids the division),
    * fixed-pointed cents ([[graft.ops.WeightedMedian]]). The cumulative
    * weight is the shared two-phase distributed prefix scan over the one
    * global (flag, cents) order — NOT a `PARTITION BY flag` window,
    * whose parallelism would be pinned to the 3-flag domain forever.
    * The robust "typical price" statistic percentile_cont's
    * interpolation can't state exactly. */
  def q161WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val qty = round(col("l_quantity")).cast("long")
    graft.ops.WeightedMedian.lowerMedian(
        Tables.lineitem(spark, dir)
          .select(col("l_returnflag"), cents.as("cents"), qty.as("w")),
        "l_returnflag", "cents", "w")
      .select(col("l_returnflag"), col("median_value").as("median_cents"),
        col("total_weight").as("total_qty"))
      .orderBy(col("l_returnflag"))
  }

  val q161Sql: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, cents, w,
      |    CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT)
      |      AS total,
      |    CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cw
      |  FROM b)
      |SELECT l_returnflag, min(cents) AS median_cents,
      |  max(total) AS total_qty
      |FROM c WHERE cw * 2 >= total
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q162 — 2-D Pareto frontier (skyline) of lineitem on (price ↑,
    * quantity ↑): the rows no other row dominates on both axes. Reduced
    * to integers-only in two moves: collapse to the per-price max
    * quantity (one hash agg — the only corpus-scale pass), then keep a
    * price point iff its max quantity strictly beats everything at any
    * HIGHER price — an exclusive running max over the price-descending
    * total order, [[graft.ops.PrefixScan]] again (the naive global
    * window is the oracle's plan). Output size is the frontier, tiny by
    * construction. */
  def q162ParetoFrontier(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val qty = round(col("l_quantity")).cast("long")
    val best = Tables.lineitem(spark, dir)
      .select(cents.as("cents"), qty.as("qty"))
      .groupBy(col("cents")).agg(max(col("qty")).as("max_qty"))
      .withColumn("neg_cents", -col("cents"))
    graft.ops.PrefixScan.exclusiveRunningMax(
        best, col("max_qty"), "qty_above", col("neg_cents"))
      .filter(col("qty_above").isNull ||
        col("max_qty") > col("qty_above"))
      .select(col("cents"), col("max_qty"))
      .orderBy(col("cents").desc)
  }

  val q162Sql: String =
    """WITH b AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(max(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
      |      AS max_qty
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT cents, max_qty,
      |    max(max_qty) OVER (ORDER BY cents DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS qty_above
      |  FROM b)
      |SELECT cents, max_qty FROM r
      |WHERE qty_above IS NULL OR max_qty > qty_above
      |ORDER BY cents DESC""".stripMargin

  /** q164 — small-zone compaction planning (the OPTIMIZE scheduler of a
    * lakehouse maintenance loop): from the zone-stats table (metadata,
    * [[ZoneMap.zoneStats]] over n_chars-band zones), pick every zone
    * under the 400-row small-file threshold and pack the picks into
    * compaction batches of ≤ 1000 rows in zone order —
    * [[graft.ops.Packing]]'s streaming-packer rule on METADATA rows (the
    * corpus never re-scans; the plan is what an executor service would
    * consume). Output: zone, rows, its batch id, and the batch's
    * running start. */
  def q164CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val stats = ZoneMap.zoneStats(
      Tables.documents(spark, dir), expr("n_chars DIV 64"),
      Seq("doc_id" -> col("doc_id")))
    val small = stats.filter(col("n_rows") < 400L)
      .select(col("zone"), col("n_rows"))
    graft.ops.Packing.packByBudget(small, col("n_rows"), budget = 1000L,
        col("zone"))
      .select(col("zone"), col("n_rows"), col("running_start"),
        col("shard_id").as("compaction_group"))
      .orderBy(col("zone"))
  }

  val q164Sql: String =
    """WITH s AS (
      |  SELECT n_chars // 64 AS zone, CAST(count(*) AS BIGINT) AS n_rows
      |  FROM documents GROUP BY 1),
      |small AS (SELECT zone, n_rows FROM s WHERE n_rows < 400),
      |r AS (
      |  SELECT zone, n_rows,
      |    CAST(coalesce(sum(n_rows) OVER (ORDER BY zone
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS running_start
      |  FROM small)
      |SELECT zone, n_rows, running_start,
      |  CAST(running_start // 1000 AS BIGINT) AS compaction_group
      |FROM r ORDER BY zone""".stripMargin

  val q158Sql: String =
    """WITH t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total
      |           FROM documents),
      |s AS (SELECT greatest(1, total // 50) AS step FROM t),
      |r AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS running_start
      |  FROM documents)
      |SELECT doc_id, source, n_chars, running_start
      |FROM r CROSS JOIN s
      |WHERE ((running_start + step - 1) // step) * step
      |      < running_start + n_chars
      |ORDER BY doc_id""".stripMargin

  /** q181 — metadata-only corpus totals through the zoned source's
    * AGGREGATE pushdown ([[graft.sources.ZonedSource]],
    * SupportsPushDownAggregates): a filterless
    * COUNT(*)/MIN/MAX over the same q150 layout plans a ZonedAggScan
    * that answers from the manifest — one row per zone, ZERO data files
    * opened (ZonedSourceSpec proves it by deleting every data file and
    * asking again). The oracle reads the ORIGINAL parquet, so a manifest
    * that drifted from the rows cannot hash-match. */
  def q181ZonedAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.ZonedSource")
      .load(zonedPath(spark, dir))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  val q181Sql: String =
    """SELECT count(*) AS n_docs,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM documents""".stripMargin
}
