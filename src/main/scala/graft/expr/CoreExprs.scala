package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Core scalar-expression vocabulary of the reference engine, re-expressed as
 * Catalyst `Column` combinators (all codegen'd builtins — SURVEY.md §2.8
 * shows zero custom Expressions are required for the core surface).
 */
object CoreExprs {

  /**
   * The reference's day bucketing: a fixed −1h shift then a date truncation —
   * `(x::timestamp - '1 HOUR'::interval)::date`
   * (/root/reference/trends.go:311, 377, 399). Deliberately NOT a timezone
   * conversion (wrong during DST in the reference too); we preserve the
   * fixed-shift semantics and run with spark.sql.session.timeZone=UTC.
   */
  def dayBucket(ts: Column): Column =
    to_date(ts - expr("INTERVAL '1' HOUR"))

  /**
   * Pushdown-friendly rewrite of `dayBucket(ts) === day`: a half-open range
   * on the raw timestamp. `to_date(ts - 1h) = D` wraps the scanned column in
   * expressions, which blocks parquet/JDBC predicate pushdown; the range form
   * `ts >= D+1h AND ts < D+1d+1h` compares the bare column, so it reaches
   * PushedFilters (and prunes partitions on a ts-partitioned table).
   * Semantically identical (SURVEY.md §4).
   */
  def dayBucketEquals(ts: Column, day: String): Column = {
    val lo = to_timestamp(lit(day)) + expr("INTERVAL '1' HOUR")
    ts >= lo && ts < lo + expr("INTERVAL '1' DAY")
  }

  /**
   * F4 week mode, CORRECTED: the reference's `-since-last-week` emits
   * syntactically invalid SQL (`NOW()::now - '7 DAYS::interval'`,
   * /root/reference/trends.go:531-534 — the flag can never have worked).
   * The intended semantics per the surrounding code is "status created
   * within the trailing 7 days under the −1h shift":
   * `ts − 1h > now − 7 days`, i.e. a bare-column range compare (pushdown-
   * friendly, like dayBucketEquals). `now` is injectable for testability.
   * Documented deviation (SURVEY §7.4 #5).
   */
  def withinLastWeek(ts: Column, now: Column): Column =
    ts > now - expr("INTERVAL '7' DAY") + expr("INTERVAL '1' HOUR")

  /**
   * Status URL assembly — CONCAT('https://twitter.com/', name, '/status/', id)
   * (/root/reference/trends.go:281).
   */
  def statusUrl(fullName: Column, statusId: Column): Column =
    concat(lit("https://twitter.com/"), fullName, lit("/status/"), statusId)

  /**
   * Popularity coalesce chain, retweets flavor: live same-day popularity
   * sample beats the frozen highlight counter beats the raw API document
   * (/root/reference/trends.go:338-342). `doc` is the raw JSON string.
   */
  def retweetsChain(popularity: Column, frozen: Column, doc: Column): Column =
    coalesce(popularity, frozen,
      get_json_object(doc, "$.retweet_count").cast(IntegerType))

  /**
   * Favorites flavor. NOTE the reference has a bug here: its middle fallback
   * is `h.total_retweets` — mixing retweets into the favorites chain
   * (/root/reference/trends.go:343-344). We implement the sane semantics
   * (favorites all the way down); documented deviation per SURVEY.md §7.4.
   */
  def favoritesChain(popularity: Column, frozen: Column, doc: Column): Column =
    coalesce(popularity, frozen,
      get_json_object(doc, "$.favorite_count").cast(IntegerType))

  /**
   * "Is this status a retweet" — the highlight flag when present, else the
   * presence of `retweeted_status_result` in the raw API doc, else false
   * (/root/reference/trends.go:370-378).
   */
  def isOfRetweetKind(isRetweet: Column, doc: Column): Column =
    coalesce(
      isRetweet,
      get_json_object(doc, "$.retweeted_status_result").isNotNull,
      lit(false))

  /** Nested author-id extraction — `(doc->'user'->>'id_str')::bigint`
    * (/root/reference/trends.go:379). */
  def authorTwitterId(doc: Column): Column =
    get_json_object(doc, "$.user.id_str").cast(LongType)
}
