package graft.model

import org.apache.spark.sql.types._

/**
 * Schemas for the tweet-domain tables the reference engine queries, inferred
 * from column usage in the reference SQL (see /root/reference/trends.go:279-406
 * and FIXTURES.md §A). These are the five PostgreSQL relations plus the raw
 * Twitter-API JSON document embedded in `weaving_status.ust_api_document`
 * (trends.go:338-348) and the 11-column result contract (trends.go:279-292).
 *
 * Explicit StructTypes everywhere: the reference decodes columns positionally
 * (trends.go:577-607); we make the contract nominal instead.
 */
object Schemas {

  /** weaving_status — one row per collected tweet (trends.go:294-299). */
  val weavingStatus: StructType = StructType(Seq(
    StructField("ust_id", LongType, nullable = false),
    StructField("ust_status_id", StringType),
    StructField("ust_full_name", StringType),
    StructField("ust_text", StringType),
    StructField("ust_created_at", TimestampType),
    StructField("ust_api_document", StringType)
  ))

  /** highlight — one row per curated publication (trends.go:294-321). */
  val highlight: StructType = StructType(Seq(
    StructField("status_id", LongType, nullable = false),
    StructField("aggregate_id", LongType),
    StructField("member_id", LongType),
    StructField("is_retweet", BooleanType),
    StructField("publication_date_time", TimestampType),
    StructField("total_retweets", IntegerType),
    StructField("total_favorites", IntegerType)
  ))

  /** publishers_list — tiny publisher/list dimension (trends.go:300-305). */
  val publishersList: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("public_id", StringType),
    StructField("screen_name", StringType),
    StructField("deleted_at", TimestampType)
  ))

  /** status_popularity — per-status popularity time series (trends.go:396-399). */
  val statusPopularity: StructType = StructType(Seq(
    StructField("status_id", LongType, nullable = false),
    StructField("checked_at", TimestampType),
    StructField("total_retweets", IntegerType),
    StructField("total_favorites", IntegerType)
  ))

  /** weaving_user — member dimension (trends.go:313-319, 379-385). */
  val weavingUser: StructType = StructType(Seq(
    StructField("usr_id", LongType),
    StructField("usr_twitter_username", StringType),
    StructField("usr_twitter_id", StringType)
  ))

  /**
   * Schema of the raw Twitter API JSON payload, restricted to the fields the
   * reference consumes (trends.go:61-66, 338-348, 378-379). Used with
   * `from_json` — malformed documents yield NULL, mirroring the reference's
   * skip-not-fatal policy (trends.go:690-694).
   */
  val apiDocument: StructType = StructType(Seq(
    StructField("id_str", StringType),
    StructField("full_text", StringType),
    StructField("retweet_count", IntegerType),
    StructField("favorite_count", IntegerType),
    // presence ⇒ this status is a retweet (trends.go:347, 378)
    StructField("retweeted_status_result", StructType(Seq(
      StructField("id", StringType)))),
    StructField("user", StructType(Seq(
      StructField("id_str", StringType))))
  ))

  /** The 11-column SELECT contract of both highlight queries (trends.go:279-292). */
  val resultRow: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("username", StringType),
    StructField("tweet", StringType),
    StructField("publicationDate", TimestampType),
    StructField("json", StringType),
    StructField("retweets", IntegerType),
    StructField("favorites", IntegerType),
    StructField("id", LongType),
    StructField("statusId", StringType),
    StructField("is_retweet", BooleanType),
    StructField("checkedAt", TimestampType)
  ))
}

/** Typed view of the 11-column result row (trends.go:68-81 `Tweet`). */
final case class HighlightRow(
    url: String,
    username: String,
    tweet: String,
    publicationDate: java.sql.Timestamp,
    json: String,
    retweets: Int,
    favorites: Int,
    id: Long,
    statusId: String,
    is_retweet: Boolean,
    checkedAt: java.sql.Timestamp)

/** The 12-field sink document (trends.go:716-729). */
final case class SinkDoc(
    id: Long,
    twitterId: String,
    username: String,
    text: String,
    url: String,
    json: String,
    publishedAt: String,
    checkedAt: String,
    isRetweet: Boolean,
    twitter_id: String,
    totalRetweets: Int,
    totalFavorites: Int)
