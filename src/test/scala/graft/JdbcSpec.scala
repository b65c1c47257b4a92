package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.expr.CoreExprs
import graft.sink.JdbcUpsertSink
import graft.sources.JdbcSource
import graft.sources.JdbcSource.JdbcConfig

/** End-to-end JDBC path against an embedded Derby database (the Derby jars
  * ship with Spark): real format("jdbc") reads with pushdown assertions and
  * the delete-then-insert upsert sink, replayed. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val cfg = JdbcConfig(url, "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private lazy val db: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      """CREATE TABLE weaving_status (
        |  ust_id BIGINT, ust_status_id VARCHAR(32), ust_full_name VARCHAR(64),
        |  ust_text VARCHAR(256), ust_created_at TIMESTAMP,
        |  ust_api_document VARCHAR(1024))""".stripMargin)
    st.executeUpdate(
      "INSERT INTO weaving_status VALUES (1, '101', 'alpha', 't1', TIMESTAMP('2023-03-10 10:00:00'), '{}')")
    st.executeUpdate(
      "INSERT INTO weaving_status VALUES (2, '102', 'beta', 't2', TIMESTAMP('2023-03-10 23:30:00'), '{}')")
    // 00:30 next day buckets back INTO 2023-03-10 via the −1h shift
    st.executeUpdate(
      "INSERT INTO weaving_status VALUES (3, '103', 'gamma', 't3', TIMESTAMP('2023-03-11 00:30:00'), '{}')")
    st.executeUpdate(
      "INSERT INTO weaving_status VALUES (4, '104', 'delta', 't4', TIMESTAMP('2023-03-12 10:00:00'), '{}')")
    st.executeUpdate(
      """CREATE TABLE sink_docs (
        |  id BIGINT, list_id VARCHAR(32), ingest_date VARCHAR(10),
        |  retweets INT)""".stripMargin)
    st.close(); conn.close()
  }

  test("JDBC read pushes the range-form day predicate to the database") {
    db
    val df = JdbcSource.table(spark, cfg, "weaving_status")
      .filter(CoreExprs.dayBucketEquals(col("UST_CREATED_AT"), "2023-03-10"))
      .select(col("UST_ID"), col("UST_FULL_NAME"))
    // correctness: rows at 10:00 and 23:30, PLUS next-day 00:30 (−1h pulls
    // it back); 03-12 is out
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    // the plan must show the predicate INSIDE the JDBC scan (PushedFilters),
    // not as a post-scan Spark filter — dayBucketEquals' range form exists
    // exactly for this (CoreExprs.scala)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan.take(500))
    assert(plan.contains("UST_CREATED_AT IsNotNull") ||
      plan.contains("UST_CREATED_AT >=") ||
      plan.contains("GreaterThanOrEqual(UST_CREATED_AT"), plan.take(1500))
  }

  test("JDBC upsert sink: replaying a scope does not duplicate rows") {
    db
    import spark.implicits._
    val batch1 = Seq((1L, "L1", "2023-03-10", 5), (2L, "L1", "2023-03-10", 7))
      .toDF("id", "list_id", "ingest_date", "retweets")
    JdbcUpsertSink.write(batch1, url, "sink_docs",
      Seq(Seq("list_id" -> "L1", "ingest_date" -> "2023-03-10")))
    // replay with an updated value — the scope delete makes it last-writer-wins
    val batch2 = Seq((1L, "L1", "2023-03-10", 50), (2L, "L1", "2023-03-10", 70))
      .toDF("id", "list_id", "ingest_date", "retweets")
    JdbcUpsertSink.write(batch2, url, "sink_docs",
      Seq(Seq("list_id" -> "L1", "ingest_date" -> "2023-03-10")))
    val back = JdbcSource.table(spark, cfg, "sink_docs").collect()
    assert(back.length === 2)
    assert(back.map(r => r.getAs[Int]("RETWEETS")).sorted.toSeq === Seq(50, 70))
  }

  test("other scopes survive a scoped replay (partition-truncate semantics)") {
    db
    import spark.implicits._
    val other = Seq((9L, "L2", "2023-03-10", 1))
      .toDF("id", "list_id", "ingest_date", "retweets")
    JdbcUpsertSink.write(other, url, "sink_docs",
      Seq(Seq("list_id" -> "L2", "ingest_date" -> "2023-03-10")))
    val l1 = Seq((1L, "L1", "2023-03-10", 99))
      .toDF("id", "list_id", "ingest_date", "retweets")
    JdbcUpsertSink.write(l1, url, "sink_docs",
      Seq(Seq("list_id" -> "L1", "ingest_date" -> "2023-03-10")))
    val back = JdbcSource.table(spark, cfg, "sink_docs")
      .orderBy("ID").collect()
    assert(back.map(_.getAs[Long]("ID")).toSeq === Seq(1L, 9L))
  }

  test("scope values with quotes round-trip as data, not SQL") {
    db
    import spark.implicits._
    val evil = "L'; DELETE FROM sink_docs; --"
    val rows = Seq((100L, evil, "2023-04-01", 3))
      .toDF("id", "list_id", "ingest_date", "retweets")
    // twice: the replay's scoped DELETE must bind the quoted value cleanly
    // (the old interpolated WHERE threw a Derby syntax error here) and
    // must not touch other scopes
    JdbcUpsertSink.write(rows, url, "sink_docs",
      Seq(Seq("list_id" -> evil, "ingest_date" -> "2023-04-01")))
    JdbcUpsertSink.write(rows, url, "sink_docs",
      Seq(Seq("list_id" -> evil, "ingest_date" -> "2023-04-01")))
    val back = JdbcSource.table(spark, cfg, "sink_docs")
      .where($"ID" === 100L).collect()
    assert(back.length === 1)
    assert(back.head.getAs[String]("LIST_ID") === evil)
  }

  test("keyCols makes the insert stage idempotent at row granularity") {
    db
    import spark.implicits._
    val rows = Seq((200L, "L9", "2023-05-01", 1), (201L, "L9", "2023-05-01", 2))
      .toDF("id", "list_id", "ingest_date", "retweets")
    // no scope delete at all — only the in-transaction delete-by-key runs,
    // so a replayed task (same rows again) converges instead of duplicating
    JdbcUpsertSink.write(rows, url, "sink_docs", scopes = Nil,
      keyCols = Seq("id"))
    JdbcUpsertSink.write(rows, url, "sink_docs", scopes = Nil,
      keyCols = Seq("id"))
    val back = JdbcSource.table(spark, cfg, "sink_docs")
      .where($"ID" >= 200L).collect()
    assert(back.map(_.getAs[Long]("ID")).sorted.toSeq === Seq(200L, 201L))
  }

  test("staged keyed upsert: 10^5 distinct keys never cross the driver, " +
    "replay converges, off-scope rows survive") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      """CREATE TABLE wide_keys (
        |  k BIGINT, src VARCHAR(16), v BIGINT)""".stripMargin)
    st.close(); conn.close()
    val n = 100000
    // seed: keys 0..n-1 with v = -1, plus an off-scope tail the upsert
    // must never touch
    JdbcUpsertSink.write(
      (0L until n.toLong).toDF("k")
        .select($"k", lit("seed").as("src"), lit(-1L).as("v")),
      url, "wide_keys", scopes = Seq(Nil), maxWriteTasks = 8)
    JdbcUpsertSink.write(
      Seq((900000001L, "keep", 7L)).toDF("k", "src", "v"),
      url, "wide_keys", scopes = Nil, maxWriteTasks = 1)
    // one batch carrying 10^5 DISTINCT keys: the scoped-DELETE path would
    // bind 10^5 driver-collected tuples into one statement; the staged
    // path ships them executor-side and issues one WHERE EXISTS
    val batch = (0L until n.toLong).toDF("k")
      .select($"k", lit("b1").as("src"), ($"k" * 2).as("v"))
    JdbcUpsertSink.writeStagedKeyed(batch, url, "wide_keys", Seq("k"),
      maxWriteTasks = 8)
    def stats() = JdbcSource.table(spark, cfg, "wide_keys")
      .agg(count(lit(1)), sum(when($"SRC" === "b1", 1L).otherwise(0L)),
        sum(when($"SRC" === "keep", 1L).otherwise(0L)))
      .as[(Long, Long, Long)].collect().head
    assert(stats() === ((n + 1L, n.toLong, 1L)))
    // replay of the identical batch (what foreachBatch does after a
    // failure) must be a no-op
    JdbcUpsertSink.writeStagedKeyed(batch, url, "wide_keys", Seq("k"),
      maxWriteTasks = 8)
    assert(stats() === ((n + 1L, n.toLong, 1L)))
    // and the staging tables (unique name per invocation) are cleaned up
    val c2 = DriverManager.getConnection(url)
    try {
      val rs = c2.getMetaData.getTables(null, null, "WIDE_KEYS__STAGE%", null)
      assert(!rs.next(), "staging table left behind")
    } finally c2.close()
  }

  test("staged keyed upsert: a string key longer than 512 chars stages " +
    "without truncation failure") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      "CREATE TABLE long_keys (k VARCHAR(4096), v BIGINT)")
    st.close(); conn.close()
    val giant = "x" * 2000 // > the old fixed VARCHAR(512) stage width
    val b1 = Seq((giant, 1L), ("short", 1L)).toDF("k", "v")
    JdbcUpsertSink.writeStagedKeyed(b1, url, "long_keys", Seq("k"),
      maxWriteTasks = 1)
    val b2 = Seq((giant, 2L)).toDF("k", "v") // upsert the giant key
    JdbcUpsertSink.writeStagedKeyed(b2, url, "long_keys", Seq("k"),
      maxWriteTasks = 1)
    val back = JdbcSource.table(spark, cfg, "long_keys")
      .select($"K", $"V").as[(String, Long)].collect().toMap
    assert(back === Map(giant -> 2L, "short" -> 1L))
  }

  test("staged keyed upsert: two concurrent writers to one target never " +
    "clobber each other's staged keys") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate("CREATE TABLE conc_tgt (k BIGINT, v BIGINT)")
    st.close(); conn.close()
    // disjoint key ranges: with the old FIXED stage name, writer B's
    // DROP/CREATE raced writer A's staged keys (wrong deletes / aborts);
    // with per-invocation names both must land completely
    def batch(lo: Long, tag: Long) =
      (lo until lo + 500L).toDF("k").select($"k", lit(tag).as("v"))
    val fs = Seq(0L -> 1L, 1000000L -> 2L).map { case (lo, tag) =>
      Future(JdbcUpsertSink.writeStagedKeyed(
        batch(lo, tag), url, "conc_tgt", Seq("k"), maxWriteTasks = 2))
    }
    fs.foreach(Await.result(_, 120.seconds))
    val got = JdbcSource.table(spark, cfg, "conc_tgt")
      .agg(count(lit(1)), sum(when($"V" === 1L, 1L).otherwise(0L)),
        sum(when($"V" === 2L, 1L).otherwise(0L)))
      .as[(Long, Long, Long)].collect().head
    assert(got === ((1000L, 500L, 500L)))
  }
}
