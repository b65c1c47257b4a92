package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.queries.HighlightQueries.TrendsTables

/**
 * Deterministic tweet-domain fixture tables (Schemas shapes) DERIVED from
 * the driver's testdata parquet, so the DuckDB oracle can rebuild the exact
 * same five tables from the same parquet with WITH-clause twins
 * (DomainQueries.fixtureCte) and machine-check the faithful reference
 * queries end to end — the fidelity gate the ScalaTest fixtures can't give.
 *
 * Design notes:
 *  - orders are spread over ~2400 days (≤16/day), far too thin for a
 *    day-bucketed query, so event times sit at `date_trunc(month) + small
 *    hour offset`: every order of a month lands on the month's first
 *    bucketed day (hour ∈ 1..12, and bucket(ts) = date(ts − 1h)).
 *  - highlight.publication_date_time uses hours 1..36, so ~⅓ of highlights
 *    fall OUT of the day bucket (exercises F1/F3 alignment).
 *  - popularity samples sit at pub_time + 1..19h, so per-status samples
 *    split between same-day (counted) and next-day (ignored) (J5).
 *  - NULL total_retweets/favorites/is_retweet rows exercise the P3/P4
 *    coalesce chains and the F6 doc fallback.
 *  - publishers_list 12 (deleted, NULL screen_name) and 17 (deleted, named)
 *    drive the F7/F8 NOT-IN exclusion and its F9 null guards.
 *
 * Every expression here must stay textually in sync with
 * DomainQueries.fixtureCte — the oracle compares raw output strings.
 */
object DomainFixtures {

  /** weaving_status ≙ one tweet per order (Schemas.weavingStatus). */
  def weavingStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).selectExpr(
      "o_orderkey AS ust_id",
      "CAST(o_orderkey AS STRING) AS ust_status_id",
      "concat('pub_', CAST(o_custkey % 25 AS STRING)) AS ust_full_name",
      "concat('tweet ', CAST(o_orderkey AS STRING)) AS ust_text",
      "date_trunc('MONTH', o_orderdate) + make_interval(0, 0, 0, 0, CAST(o_orderkey % 12 + 1 AS INT), 0, 0) AS ust_created_at",
      """concat('{"id_str":"', CAST(o_orderkey AS STRING),
        |  '","full_text":"tweet ', CAST(o_orderkey AS STRING),
        |  '","retweet_count":', CAST(o_orderkey % 97 AS STRING),
        |  ',"favorite_count":', CAST(o_orderkey % 89 AS STRING),
        |  ',"user":{"id_str":"', CAST(9000 + o_custkey % 40 AS STRING), '"}',
        |  CASE WHEN o_orderkey % 3 = 0 THEN ',"retweeted_status_result":{"id":"x"}' ELSE '' END,
        |  '}') AS ust_api_document""".stripMargin)

  /** highlight ≙ curated rows for ¾ of statuses (Schemas.highlight). */
  def highlight(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .where("o_orderkey % 4 <> 0")
      .selectExpr(
        "o_orderkey AS status_id",
        "CAST(o_custkey % 8 AS BIGINT) AS aggregate_id",
        "o_custkey AS member_id",
        "CASE WHEN o_orderkey % 6 = 0 THEN NULL ELSE o_orderkey % 4 = 1 END AS is_retweet",
        "date_trunc('MONTH', o_orderdate) + make_interval(0, 0, 0, 0, CAST((o_orderkey * 7) % 36 + 1 AS INT), 0, 0) AS publication_date_time",
        "CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE CAST((o_orderkey * 13) % 500 AS INT) END AS total_retweets",
        "CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE CAST((o_orderkey * 17) % 400 AS INT) END AS total_favorites")

  /** publishers_list ≙ 25 lists from nation (Schemas.publishersList). */
  def publishersList(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).selectExpr(
      "CAST(n_nationkey AS BIGINT) AS id",
      "concat('pub-list-', CAST(n_nationkey AS STRING)) AS public_id",
      "CASE WHEN n_nationkey % 6 = 0 THEN NULL ELSE concat('pub_', CAST(n_nationkey AS STRING)) END AS screen_name",
      "CASE WHEN n_nationkey IN (12, 17) THEN TIMESTAMP '2020-01-01 00:00:00' ELSE NULL END AS deleted_at")

  /** status_popularity ≙ 1..7 samples per status from lineitem
    * (Schemas.statusPopularity). */
  def statusPopularity(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr(
        "l_orderkey AS status_id",
        "date_trunc('MONTH', o_orderdate) + make_interval(0, 0, 0, 0, CAST((o_orderkey * 7) % 36 + 1 AS INT), 0, 0) " +
          "+ make_interval(0, 0, 0, 0, CAST(3 * l_linenumber - 2 AS INT), 0, 0) AS checked_at",
        "CASE WHEN (l_orderkey + l_linenumber) % 9 = 0 THEN NULL ELSE CAST((l_orderkey * 5 + l_linenumber * 31) % 600 AS INT) END AS total_retweets",
        "CASE WHEN (l_orderkey + l_linenumber) % 7 = 0 THEN NULL ELSE CAST((l_orderkey * 3 + l_linenumber * 17) % 450 AS INT) END AS total_favorites")

  /** weaving_user ≙ members from customer (Schemas.weavingUser). */
  def weavingUser(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).selectExpr(
      "c_custkey AS usr_id",
      "concat('pub_', CAST(c_custkey % 25 AS STRING)) AS usr_twitter_username",
      "CAST(9000 + c_custkey % 40 AS STRING) AS usr_twitter_id")

  def tables(spark: SparkSession, dir: String): TrendsTables =
    TrendsTables(
      weavingStatus = weavingStatus(spark, dir),
      highlight = highlight(spark, dir),
      publishersList = publishersList(spark, dir),
      statusPopularity = statusPopularity(spark, dir),
      weavingUser = weavingUser(spark, dir))
}
