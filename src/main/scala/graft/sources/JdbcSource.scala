package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.HighlightQueries.TrendsTables

/**
 * JDBC source layer — the reference's actual input path (PostgreSQL via
 * lib/pq, /root/reference/trends.go:215-223; all reads are prepared
 * statements over that handle, :414, :501). The north-star architecture is
 * "Structured Streaming + JDBC": batch builders read these tables, and the
 * streaming layer's foreachBatch writes back over JDBC (JdbcUpsertSink).
 *
 * Pushdown contract: the day-bucket predicate MUST reach the database as a
 * WHERE clause — that is why CoreExprs.dayBucketEquals rewrites
 * `date(ts - 1h) = D` into the half-open range `ts >= D+1h AND ts < D+1d+1h`
 * on the BARE column: Spark's JDBC source pushes plain comparisons but not
 * expression-wrapped ones. JdbcSourceSpec asserts the filters appear in the
 * scan's PushedFilters against a live (embedded Derby) database.
 *
 * At cluster scale add `partitionColumn/lowerBound/upperBound/numPartitions`
 * (partitioned ranged reads) — exposed here as options — so each executor
 * reads a slice instead of one connection streaming the whole table.
 */
object JdbcSource {

  final case class JdbcConfig(
      url: String,
      driver: String,
      user: Option[String] = None,
      password: Option[String] = None,
      fetchSize: Int = 1000,
      // ranged-read parallelism (0 partitions = single connection)
      partitionColumn: Option[String] = None,
      lowerBound: Option[String] = None,
      upperBound: Option[String] = None,
      numPartitions: Int = 0)

  /** One table over JDBC, Catalyst-pushdown-ready. */
  def table(spark: SparkSession, cfg: JdbcConfig, name: String): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("driver", cfg.driver)
      .option("dbtable", name)
      .option("fetchsize", cfg.fetchSize)
    cfg.user.foreach(u => r = r.option("user", u))
    cfg.password.foreach(p => r = r.option("password", p))
    (cfg.partitionColumn, cfg.lowerBound, cfg.upperBound) match {
      case (Some(c), Some(lo), Some(hi)) if cfg.numPartitions > 0 =>
        r = r.option("partitionColumn", c).option("lowerBound", lo)
          .option("upperBound", hi).option("numPartitions", cfg.numPartitions)
      case _ =>
    }
    r.load()
  }

  /** The five reference tables over one JDBC database — a drop-in
    * replacement for the parquet-backed loaders (same TrendsTables
    * contract; the query builders don't care where the tables come from). */
  def trendsTables(spark: SparkSession, cfg: JdbcConfig): TrendsTables =
    TrendsTables(
      weavingStatus = table(spark, cfg, "weaving_status"),
      highlight = table(spark, cfg, "highlight"),
      publishersList = table(spark, cfg, "publishers_list"),
      statusPopularity = table(spark, cfg, "status_popularity"),
      weavingUser = table(spark, cfg, "weaving_user"))
}
