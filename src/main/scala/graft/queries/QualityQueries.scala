package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.DataQuality

/**
 * Round-4 data-quality family ([[graft.ops.DataQuality]]): the contract
 * checks, referential-integrity audits and column profiles a production
 * ingest gate runs. Oracle-gated like everything else — the reports are
 * exact counts, so DuckDB reproduces them bit-for-bit.
 */
object QualityQueries {

  /** q66 — one-scan contract report over `documents`: every declared
    * check is a conditional aggregate in the SAME pass (N checks ≠ N
    * scans). Checks: null text, id/char-length mismatch, lang outside the
    * accepted domain, empty text, out-of-range doc length. */
  def q66ContractReport(spark: SparkSession, dir: String): DataFrame =
    DataQuality.contractReport(Tables.documents(spark, dir), Seq(
      "null_text" -> col("text").isNull,
      "bad_n_chars" -> (col("n_chars") =!= length(col("text"))),
      "bad_lang" -> !col("lang").isin("en", "fr", "de", "es", "zh"),
      "empty_text" -> (length(col("text")) === 0),
      "oversize_text" -> (col("n_chars") > 10000)))

  val q66Sql: String =
    """SELECT count(*) AS n_rows,
      |  count(CASE WHEN text IS NULL THEN 1 END) AS null_text,
      |  count(CASE WHEN n_chars <> length(text) THEN 1 END) AS bad_n_chars,
      |  count(CASE WHEN lang NOT IN ('en','fr','de','es','zh') THEN 1 END)
      |    AS bad_lang,
      |  count(CASE WHEN length(text) = 0 THEN 1 END) AS empty_text,
      |  count(CASE WHEN n_chars > 10000 THEN 1 END) AS oversize_text
      |FROM documents""".stripMargin

  /** q67 — referential-integrity audit across the TPC-H-ish FK chain:
    * orphan counts via LEFT ANTI joins (null-safe NOT EXISTS semantics —
    * a NOT IN would vacuum to empty on one NULL key). Three independent
    * audits, each one shuffle (or broadcast when the parent key set is
    * small, which AQE decides from stats). */
  def q67FkAudit(spark: SparkSession, dir: String): DataFrame = {
    val orphanOrders = DataQuality.orphanCount(
      Tables.orders(spark, dir), "o_custkey",
      Tables.customer(spark, dir), "c_custkey")
      .select(col("n_orphans").as("orphan_orders"))
    val orphanLineitems = DataQuality.orphanCount(
      Tables.lineitem(spark, dir), "l_orderkey",
      Tables.orders(spark, dir), "o_orderkey")
      .select(col("n_orphans").as("orphan_lineitems"))
    val orphanCustomers = DataQuality.orphanCount(
      Tables.customer(spark, dir), "c_nationkey",
      Tables.nation(spark, dir), "n_nationkey")
      .select(col("n_orphans").as("orphan_customers"))
    orphanOrders.crossJoin(orphanLineitems).crossJoin(orphanCustomers)
  }

  val q67Sql: String =
    """SELECT
      |  (SELECT count(*) FROM orders o WHERE NOT EXISTS (
      |     SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |    AS orphan_orders,
      |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (
      |     SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |    AS orphan_lineitems,
      |  (SELECT count(*) FROM customer c WHERE NOT EXISTS (
      |     SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
      |    AS orphan_customers""".stripMargin

  /** q68 — column profile of `lineitem` (nulls + exact distincts per
    * column) from ONE multi-aggregate scan, melted to rows driver-side
    * (constant work — the melt input is a single row). */
  def q68ColumnProfile(spark: SparkSession, dir: String): DataFrame =
    DataQuality.profile(Tables.lineitem(spark, dir),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
          "l_linestatus", "l_shipdate"))
      .orderBy(col("col_name"))

  val q68Sql: String =
    """SELECT col_name, n_nulls, n_distinct FROM (
      |  SELECT 'l_orderkey' AS col_name,
      |    count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_nulls,
      |    count(DISTINCT l_orderkey) AS n_distinct FROM lineitem
      |  UNION ALL SELECT 'l_partkey',
      |    count(CASE WHEN l_partkey IS NULL THEN 1 END),
      |    count(DISTINCT l_partkey) FROM lineitem
      |  UNION ALL SELECT 'l_suppkey',
      |    count(CASE WHEN l_suppkey IS NULL THEN 1 END),
      |    count(DISTINCT l_suppkey) FROM lineitem
      |  UNION ALL SELECT 'l_returnflag',
      |    count(CASE WHEN l_returnflag IS NULL THEN 1 END),
      |    count(DISTINCT l_returnflag) FROM lineitem
      |  UNION ALL SELECT 'l_linestatus',
      |    count(CASE WHEN l_linestatus IS NULL THEN 1 END),
      |    count(DISTINCT l_linestatus) FROM lineitem
      |  UNION ALL SELECT 'l_shipdate',
      |    count(CASE WHEN l_shipdate IS NULL THEN 1 END),
      |    count(DISTINCT l_shipdate) FROM lineitem)
      |ORDER BY col_name""".stripMargin

  /** q69 — retention cohorts: users grouped by first-activity day, counted
    * on each later active day as an offset from the cohort day — THE
    * product-analytics staple. Shape: one distinct (user, day) aggregate
    * staged once (it feeds both the cohort derivation and the activity
    * probe — same CacheScope discipline as the other fan-out ops), a
    * broadcast-friendly cohort join, one counting aggregate. */
  def q69RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.CacheScope
    val userDay = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    CacheScope.withStages(userDay) {
      val cohort = userDay.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      CacheScope.pin(userDay.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long")
            .as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset")))
    }
  }

  val q69Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |cohort AS (
      |  SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
      |SELECT c.cohort_day,
      |  CAST(ud.day - c.cohort_day AS BIGINT) AS day_offset,
      |  count(DISTINCT ud.user_id) AS n_users
      |FROM ud JOIN cohort c ON ud.user_id = c.user_id
      |GROUP BY 1, 2
      |ORDER BY cohort_day, day_offset""".stripMargin
}
