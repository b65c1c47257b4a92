package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.expr.CoreExprs._

/**
 * SURVEY.md §2 operator inventory transposed onto the driver's TPC-H-ish
 * testdata (FIXTURES.md §B role mapping). Each method is one
 * `SparkEntry.queries` entry with a DuckDB oracle twin in
 * `SparkEntry.oracleSql`.
 *
 * Hash-stability conventions (the driver sorts columns by name, then hashes
 * values — so every query must be value-deterministic across engines):
 *  - money/double aggregation goes through exact decimals:
 *    `sum(cast(x as decimal(18,2)))` then a final cast to double;
 *  - every query ends in a total order over its output keys;
 *  - events.ts is nanosecond-precision parquet: Spark truncates to micros,
 *    DuckDB keeps ns — never emit raw `ts`, only day-truncated forms.
 */
object CoreQueries {

  /** Exact-decimal view of a 2-decimal double column. */
  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /**
   * q01 — scan + filter + projection (S1, P2, P10; SURVEY §2.1/2.2).
   * The predicate and the 3-column projection must reach the parquet reader
   * (PushedFilters / ReadSchema — verified in PlanSpec).
   */
  def q01ScanFilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < lit("1996-01-01").cast(TimestampType))
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      // the synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
      // l_quantity is needed to pin a total order the oracle can reproduce
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  val q01Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity >= 45
      |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin

  /**
   * q02 — multi-key hash aggregate (A1/A2; SURVEY §2.5), TPC-H Q1 flavor.
   * Decimal-exact sums; partial (map-side) aggregation is automatic for
   * hash aggregates, so the shuffle carries one row per (flag,status) per
   * partition — this is the shape that survives 100 TB.
   */
  def q02GroupByAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q02Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /**
   * q03 — inner equi-join chain with broadcast dimension (J1/J2; SURVEY §2.4):
   * revenue per nation, one year. `nation` is broadcast explicitly (tiny dim,
   * like the reference's `publishers_list` — trends.go:300-305); the
   * lineitem⋈orders join shuffles on the key and AQE picks the strategy.
   */
  def q03JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType))
      .filter(col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val q03Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /**
   * q04 — LEFT outer equi-join (J3; trends.go:351-356 flips the base table so
   * unmatched rows survive): every customer with order count and spend,
   * zero-order customers included.
   */
  def q04LeftJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec(col("o_totalprice"))).cast(DoubleType), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))

  val q04Sql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  COALESCE(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin

  /**
   * q05 — disjunctive (OR-condition) join (J4; trends.go:357-367). Spark
   * would plan the OR as a BroadcastNestedLoopJoin — at 100 TB that is
   * quadratic. Since round 11 the query STATES the natural OR form and
   * [[graft.plans.DisjunctiveJoinRewrite]] (the SURVEY §7.4 rewrite
   * promoted from builder convention to a Catalyst rule) turns it into
   * the union of hash equi-joins with complement compensation — any
   * user query with this shape now gets the scale-safe plan.
   * The oracle states the same OR form.
   */
  def q05DisjunctiveJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    s.join(c, col("s_nationkey") === col("c_nationkey") ||
        col("s_suppkey") === col("c_custkey"))
      .select(col("s_suppkey"), col("c_custkey"))
      .dropDuplicates("s_suppkey", "c_custkey")
      .orderBy(col("s_suppkey"), col("c_custkey"))
  }

  val q05Sql: String =
    """SELECT DISTINCT s_suppkey, c_custkey
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey OR s_suppkey = c_custkey
      |ORDER BY s_suppkey, c_custkey""".stripMargin

  /**
   * q06 — temporally aligned LEFT join + MAX-over-COALESCE (J5/A2/P3;
   * trends.go:396-399: same-day popularity sample beats the frozen counter).
   * events ≙ status_popularity samples keyed by (user_id, −1h day bucket);
   * customer.acctbal ≙ the frozen fallback.
   */
  def q06AsOfDayJoin(spark: SparkSession, dir: String): DataFrame = {
    val day = "2024-01-15"
    val c = Tables.customer(spark, dir)
    val e = Tables.events(spark, dir)
      .filter(dayBucketEquals(col("ts"), day))
    c.join(e, col("c_custkey") === col("user_id"), "left")
      .groupBy(col("c_custkey"))
      .agg(max(coalesce(dec(col("value")), dec(col("c_acctbal"))))
        .cast(DoubleType).as("popularity"))
      .orderBy(col("c_custkey"))
  }

  val q06Sql: String =
    """SELECT c_custkey,
      |  CAST(max(COALESCE(CAST(value AS DECIMAL(18,2)), CAST(c_acctbal AS DECIMAL(18,2)))) AS DOUBLE) AS popularity
      |FROM customer LEFT JOIN events
      |  ON c_custkey = user_id
      | AND CAST(ts - INTERVAL 1 HOUR AS DATE) = DATE '2024-01-15'
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin

  /**
   * q07 — NOT-IN exclusion as anti join (F7; trends.go:313-320). The subquery
   * key (`c_custkey`) is non-nullable, so `left_anti` is exactly NOT IN
   * (SURVEY §7.4 trap #1 — the nullable case is covered in NullSemanticsSpec);
   * the null-guard filter documents the contract.
   */
  def q07NotInAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val deleted = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .filter(col("c_custkey").isNotNull)
      .select(col("c_custkey"))
    Tables.orders(spark, dir)
      .join(deleted, col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy(col("o_orderkey"))
  }

  val q07Sql: String =
    """SELECT o_orderkey, o_custkey
      |FROM orders
      |WHERE o_custkey NOT IN (
      |  SELECT c_custkey FROM customer
      |  WHERE c_mktsegment = 'BUILDING' AND c_custkey IS NOT NULL)
      |ORDER BY o_orderkey""".stripMargin

  /**
   * q08 — per-group argmax via single struct-max (A3; trends.go:336-349's
   * `ARRAY_AGG(x ORDER BY k DESC)[1]` idiom). ONE `max(struct(...))` keeps
   * all payload columns from the same winning row — 9 independent `max_by`s
   * could mix rows on ties (SURVEY §7.4 trap #2). Tiebreak is pinned
   * (orderkey DESC, linenumber DESC) so the oracle can reproduce it.
   */
  def q08ArgmaxStructMax(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(max(struct(
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_quantity"))).as("best"))
      .select(
        col("l_suppkey"),
        col("best.l_extendedprice").as("best_price"),
        col("best.l_orderkey").as("best_orderkey"),
        col("best.l_linenumber").as("best_linenumber"),
        col("best.l_partkey").as("best_partkey"),
        col("best.l_quantity").as("best_quantity"))
      .orderBy(col("l_suppkey"))

  val q08Sql: String =
    """SELECT l_suppkey, l_extendedprice AS best_price, l_orderkey AS best_orderkey,
      |  l_linenumber AS best_linenumber, l_partkey AS best_partkey, l_quantity AS best_quantity
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rn
      |  FROM lineitem)
      |WHERE rn = 1
      |ORDER BY l_suppkey""".stripMargin

  /**
   * q09 — window-function variant of per-group ranking (SURVEY §2.5 "Absent"
   * row: the engine must prove `row_number OVER` ≡ the argmax idiom):
   * top-3 lineitems per supplier.
   */
  def q09WindowTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").desc, col("l_linenumber").desc)
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  val q09Sql: String =
    """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (
      |      PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rn
      |  FROM lineitem)
      |WHERE rn <= 3
      |ORDER BY l_suppkey, rn""".stripMargin

  /**
   * q10 — global sort + OFFSET/LIMIT pagination (O1/O2/O3; trends.go:395-406).
   * Spark plans orderBy+limit as TakeOrderedAndProject (no full global sort
   * materialization); the offset models the reference's paging (with its sane
   * semantics, not the tweetPerPage=100000 constant bug — SURVEY §7.4 #5).
   */
  def q10TopKOffset(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .offset(20)
      .limit(10)

  val q10Sql: String =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10 OFFSET 20""".stripMargin

  /**
   * q11 — JSON scalar extraction + existence predicate (P5/P7;
   * trends.go:338-348): pull `$.k` out of the raw JSON `props` column.
   */
  def q11JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
        get_json_object(col("props"), "$.k").isNotNull.as("has_k"))
      .orderBy(col("event_id"))

  val q11Sql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      |  json_extract_string(props, '$.k') IS NOT NULL AS has_k
      |FROM events
      |ORDER BY event_id""".stripMargin

  /**
   * q12 — −1h-shifted day bucketing + daily aggregate (F1/F2/P8/P9;
   * trends.go:308-311). The filterless grouped form; the pushdown-friendly
   * range form of the same predicate is exercised in q06 and PlanSpec.
   */
  def q12DayBucketAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayBucket(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast(DoubleType).as("total_value"))
      .orderBy(col("day"))

  val q12Sql: String =
    """SELECT CAST(ts - INTERVAL 1 HOUR AS DATE) AS day,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1
      |ORDER BY day""".stripMargin

  /**
   * q13 — COALESCE fallback chain with JSON last resort (P3/P4;
   * trends.go:338-348): live value (only for purchases) → JSON doc value →
   * zero. Implements the SANE favorites semantics, not the reference's
   * mixed-chain bug at trends.go:344 (documented deviation).
   */
  def q13CoalesceChain(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        coalesce(
          when(col("event_type") === "purchase", col("value")),
          get_json_object(col("props"), "$.k").cast(DoubleType),
          lit(0.0)).as("eff_value"))
      .orderBy(col("event_id"))

  val q13Sql: String =
    """SELECT event_id,
      |  COALESCE(CASE WHEN event_type = 'purchase' THEN value END,
      |           CAST(json_extract_string(props, '$.k') AS DOUBLE),
      |           0.0) AS eff_value
      |FROM events
      |ORDER BY event_id""".stripMargin

  /**
   * q14 — scalar COUNT over a join tree (A4; trends.go:450-529 drives buffer
   * sizing from this). Distributed count — no driver-side collect.
   */
  def q14CountScalar(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("n"))

  val q14Sql: String =
    """SELECT count(*) AS n
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'""".stripMargin

  /**
   * q15 — three-pass union with discriminator column (SURVEY §2.7: the
   * reference's three sink "status types", trends.go:151-198, become one
   * unioned DataFrame partitionable by `status_type`). Each pass is a
   * per-status top-5 (TakeOrderedAndProject), unioned, then totally ordered.
   */
  def q15UnionDiscriminator(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def pass(status: String): DataFrame =
      o.filter(col("o_orderstatus") === status)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(5)
        .select(lit(status).as("status_type"), col("o_orderkey"), col("o_totalprice"))
    pass("F").union(pass("O")).union(pass("P"))
      .orderBy(col("status_type"), col("o_totalprice").desc, col("o_orderkey"))
  }

  val q15Sql: String =
    """SELECT * FROM (
      |  SELECT * FROM (SELECT 'F' AS status_type, o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F' ORDER BY o_totalprice DESC, o_orderkey LIMIT 5)
      |  UNION ALL
      |  SELECT * FROM (SELECT 'O' AS status_type, o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O' ORDER BY o_totalprice DESC, o_orderkey LIMIT 5)
      |  UNION ALL
      |  SELECT * FROM (SELECT 'P' AS status_type, o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'P' ORDER BY o_totalprice DESC, o_orderkey LIMIT 5))
      |ORDER BY status_type, o_totalprice DESC, o_orderkey""".stripMargin

  /**
   * q16 — DISTINCT as grouped dedup (A1's purpose; trends.go:323-334 groups
   * by all output columns to dedup popularity samples).
   */
  def q16Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .dropDuplicates()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q16Sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /**
   * q17 — IN-list membership + null guard (F10/F9; trends.go:302-305's
   * two-uuid disjunction is an `isin`).
   */
  def q17IsInFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .filter(col("n_nationkey").isin(1, 3, 5, 7, 11))
      .filter(col("n_name").isNotNull)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))

  val q17Sql: String =
    """SELECT n_nationkey, n_name, n_regionkey
      |FROM nation
      |WHERE n_nationkey IN (1, 3, 5, 7, 11) AND n_name IS NOT NULL
      |ORDER BY n_nationkey""".stripMargin

  /**
   * q18 — scalar string/cast roll-up (P1/P2/P10; trends.go:281's URL concat
   * contract on the supplier "publisher" analog).
   */
  def q18ScalarFunctions(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    s.select(
      col("s_suppkey"),
      statusUrl(col("s_name"), col("s_suppkey").cast(StringType)).as("url"),
      upper(col("s_name")).as("name_upper"),
      length(col("s_name")).as("name_len"))
      .orderBy(col("s_suppkey"))
  }

  val q18Sql: String =
    """SELECT s_suppkey,
      |  'https://twitter.com/' || s_name || '/status/' || CAST(s_suppkey AS VARCHAR) AS url,
      |  upper(s_name) AS name_upper,
      |  length(s_name) AS name_len
      |FROM supplier
      |ORDER BY s_suppkey""".stripMargin

  /**
   * q19 — malformed-JSON validity gate (P12; trends.go:690-694 skips invalid
   * docs instead of aborting). Every 10th doc is deliberately truncated to
   * simulate corruption; validity = whole-document JSON parse success
   * (Spark: `get_json_object(doc,'$')`, DuckDB: `json_valid`).
   */
  def q19JsonValidityGate(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("doc",
        when(col("event_id") % 10 === 0, substring(col("props"), 1, 3))
          .otherwise(col("props")))
      .select(get_json_object(col("doc"), "$").isNotNull.as("is_valid"))
      .groupBy(col("is_valid"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("is_valid"))

  val q19Sql: String =
    """SELECT json_valid(doc) AS is_valid, count(*) AS n
      |FROM (SELECT CASE WHEN event_id % 10 = 0 THEN substr(props, 1, 3) ELSE props END AS doc
      |      FROM events)
      |GROUP BY 1
      |ORDER BY is_valid""".stripMargin

  /**
   * q20 — tumbling 1-day event-time window in batch (SURVEY §2.9: the daily
   * cron batch generalizes to a `window()` group — the Structured Streaming
   * twin of this exact aggregation lives in graft.streaming).
   */
  def q20TumblingDayWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("w.start").as("day_start"), col("n_events"), col("total_value"))
      .orderBy(col("day_start"))

  val q20Sql: String =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1
      |ORDER BY day_start""".stripMargin
}
