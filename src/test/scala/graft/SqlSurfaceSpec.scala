package graft

import org.apache.spark.sql.DataFrame

/** The engine's SQL surface: every table loads as a temp view and the
  * DataFrame builders' results are reproducible through `spark.sql` —
  * a user can drive the same Catalyst plans with ANSI SQL strings (the
  * q72 grouping-sets query already ships on this path; here the
  * DataFrame/SQL equivalence is locked for representative shapes). */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def view(name: String): Unit =
    Tables.load(spark, dir, name).createOrReplaceTempView(name)

  test("join+agg (q03) via spark.sql equals the DataFrame builder") {
    Seq("lineitem", "orders", "customer", "nation").foreach(view)
    val sql = spark.sql(
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin)
    val df = graft.queries.CoreQueries.q03JoinAgg(spark, dir)
    assert(rows(sql) === rows(df))
  }

  test("window top-n (q09 shape) via spark.sql equals the DataFrame builder") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.events(spark, dir).createOrReplaceTempView("events_v")
    val sql = spark.sql(
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rn
        |  FROM events_v) WHERE rn <= 3
        |ORDER BY user_id, value DESC, event_id""".stripMargin)
    // mirror of the q09 selection on the same loaded table
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val df = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(col("user_id"), col("value").desc, col("event_id"))
    assert(rows(sql) === rows(df))
    assert(sql.count() > 0)
  }

  test("native functions are callable from SQL (extensions-installed)") {
    val out = spark.sql(
      "SELECT morton_key(3L, 5L) AS z, rolling_hash('abc') AS h").head()
    assert(out.getLong(0) === 0x27L)
    assert(out.getLong(1) === ("abc".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))))
  }
}
