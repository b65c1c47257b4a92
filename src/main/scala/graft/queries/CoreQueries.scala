package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q01Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity >= 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

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
}
