package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.queries.HighlightQueries.{Params, TrendsTables}
import graft.sources.JdbcSource
import graft.sources.JdbcSource.JdbcConfig

/**
 * CLI entry point ≙ the reference worker binary (`bin/trends`,
 * /root/reference/trends.go:84-131 flag surface; launched daily by cron —
 * fun.sh:342-409). Reference flags keep their names with `--` prefixes;
 * flags the reference declared but never consumed (`-username`,
 * `-read-from-local-db`, `-aggregate` — R7) are dropped.
 *
 *   --since-date=YYYY-MM-DD          default: today (≙ `date -I`)
 *   --publishers-list-id=<id>        required
 *   --deprecated-list-id=<id>        default: the hard-coded second id
 *   --migrate-distinct-sources-only  skip passes 1-2 (EP2)
 *   --since-last-week                F4 week window (corrected semantics)
 *   --dry-mode                       print plans, write nothing (truly
 *                                    side-effect-free — documented deviation)
 *   --in-parallel=true|false         false ⇒ single write task (R4)
 *   --limit=N --page=N               pagination (sane offset = page*limit)
 *
 * Source/sink selection (ours):
 *   --tables-dir=<dir>               parquet dir with the five tables
 *   --jdbc-url=<url>                 read the five tables over JDBC instead
 *   --jdbc-driver=<class>            with --jdbc-url
 *   --sink-path=<dir>                partitioned parquet sink (default)
 *   --sink-jdbc-table=<table>        JDBC upsert sink (with --jdbc-url)
 */
object TrendsMain {

  def parseArgs(args: Array[String]): Map[String, String] =
    args.map { a =>
      val s = a.stripPrefix("--")
      s.split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> "true"
      }
    }.toMap

  def paramsFrom(opts: Map[String, String]): Params = Params(
    sinceDate = opts.getOrElse("since-date",
      java.time.LocalDate.now().toString),
    listId = opts.getOrElse("publishers-list-id",
      sys.error("--publishers-list-id is required")),
    deprecatedListId = opts.getOrElse("deprecated-list-id",
      graft.queries.HighlightQueries.DeprecatedListId),
    limit = opts.getOrElse("limit", "10").toInt,
    page = opts.getOrElse("page", "0").toInt,
    sinceLastWeek = opts.contains("since-last-week"))

  def loadParquetTables(spark: SparkSession, dir: String): TrendsTables =
    TrendsTables(
      weavingStatus = spark.read.parquet(s"$dir/weaving_status.parquet"),
      highlight = spark.read.parquet(s"$dir/highlight.parquet"),
      publishersList = spark.read.parquet(s"$dir/publishers_list.parquet"),
      statusPopularity = spark.read.parquet(s"$dir/status_popularity.parquet"),
      weavingUser = spark.read.parquet(s"$dir/weaving_user.parquet"))

  def run(spark: SparkSession, opts: Map[String, String]): Unit = {
    val cfg = TrendsJob.Config(
      params = paramsFrom(opts),
      sinkPath = opts.getOrElse("sink-path", "trends_out"),
      distinctSourcesOnly = opts.contains("migrate-distinct-sources-only"),
      dryRun = opts.contains("dry-mode"))
    (opts.get("jdbc-url"), opts.get("sink-jdbc-table")) match {
      case (Some(url), Some(table)) =>
        val src = JdbcConfig(url, opts.getOrElse("jdbc-driver",
          "org.apache.derby.iapi.jdbc.AutoloadedDriver"))
        TrendsJob.runOverJdbc(spark, src, cfg, url, table)
      case (Some(url), None) =>
        val src = JdbcConfig(url, opts.getOrElse("jdbc-driver",
          "org.apache.derby.iapi.jdbc.AutoloadedDriver"))
        val t = JdbcSource.trendsTables(spark, src)
        TrendsJob.run(t, cfg)
      case (None, _) =>
        val dir = opts.getOrElse("tables-dir",
          sys.error("one of --tables-dir or --jdbc-url is required"))
        val t = loadParquetTables(spark, dir)
        // --in-parallel=false ⇒ sequential single-task write (R4)
        val docs = TrendsJob.activePasses(cfg.distinctSourcesOnly)
          .map { case (st, ds, rt) => TrendsJob.runPass(t, cfg, st, ds, rt) }
          .reduce(_ union _)
        val tasks =
          if (opts.get("in-parallel").contains("false")) 1 else 100
        graft.sink.KeyedPartitionSink.write(docs, cfg.sinkPath,
          dryRun = cfg.dryRun, maxWriteTasks = tasks)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("trends")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    try run(spark, parseArgs(args))
    finally spark.stop()
  }
}
