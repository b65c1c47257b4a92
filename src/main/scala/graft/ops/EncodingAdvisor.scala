package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Storage ENCODING ADVISOR — the ANALYZE-style pass a lakehouse runs
 * before rewriting a table: for each candidate column, measure the three
 * quantities that decide its encoding under the table's physical sort
 * order, and issue the verdict in exact integer arithmetic:
 *
 *   - n, ndv           (dictionary viability),
 *   - runs             (adjacent-equal runs in the sort order — RLE
 *                        viability; THE order-dependent statistic),
 *   - RLE    when runs·4 ≤ n        (avg run length ≥ 4),
 *   - DICT   when ndv·16 ≤ n        (each value repeats ≥ 16×),
 *   - PLAIN  otherwise — thresholds by cross-multiplication, no division.
 *
 * The interesting distributed problem is `runs`: a single-reducer
 * `lag() OVER (ORDER BY …)` is the anti-pattern. Here: range-partition
 * on the sort key, count value-change boundaries INSIDE each partition
 * with a partitioned lag window, then stitch the #partitions boundary
 * pairs (last value of p, first value of p+1) on the driver — metadata,
 * like every two-phase scan in the repo. runs = changes + 1 (n > 0).
 *
 * The run count is exact for the TOTAL order the caller provides
 * (unique tiebreaker last) — the same contract as GlobalIndex.
 */
object EncodingAdvisor {

  /** One row per candidate column: (column, n, ndv, runs, advice). */
  def advise(df: DataFrame, orderCols: Seq[Column],
             candidates: Seq[String]): DataFrame = {
    require(candidates.nonEmpty, "need candidate columns")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = candidates.map { c =>
      val (n, ndv, runs) = profile(df, orderCols, c)
      val advice =
        if (n == 0L) "EMPTY"
        else if (runs * 4L <= n) "RLE"
        else if (ndv * 16L <= n) "DICT"
        else "PLAIN"
      (c, n, ndv, runs, advice)
    }
    rows.toDF("column", "n", "ndv", "runs", "advice")
  }

  /** Exact (n, ndv, runs-under-order) for one column. */
  def profile(df: DataFrame, orderCols: Seq[Column], c: String)
      : (Long, Long, Long) = {
    val spark = df.sparkSession
    val parted = df.select((col(c).as("__v") +: orderCols): _*)
      .repartitionByRange(
        spark.sessionState.conf.numShufflePartitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    // per partition: rows, internal changes (null-safe <=> negation),
    // first/last value IN ORDER via min_by/max_by on the order tuple
    // (a bare first()/last() under hash aggregation is order-free —
    // the nondeterminism bug class this repo bans) — ONE pass,
    // #partitions rows out
    val ord = struct(orderCols: _*)
    val stats = parted
      .withColumn("__chg",
        when(row_number().over(w) === 1, 0L)
          .otherwise(when(col("__v") <=> lag(col("__v"), 1).over(w),
            0L).otherwise(1L)))
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__chg")).as("__chgs"),
        min_by(col("__v"), ord).as("__first"),
        max_by(col("__v"), ord).as("__last"))
      .orderBy(col("__pid"))
      .collect()
    val n = stats.map(_.getAs[Long]("__n")).sum
    if (n == 0L) return (0L, 0L, 0L)
    val internal = stats.map(_.getAs[Long]("__chgs")).sum
    // boundary stitching: a change where partition p's last value differs
    // from partition p+1's first (null-safe compare, driver-side)
    val boundary = stats.sliding(2).count {
      case Array(a, b) =>
        val x = a.getAs[Any]("__last"); val y = b.getAs[Any]("__first")
        !(x == y || (x == null && y == null))
      case _ => false
    }
    // exact NDV is a separate hash aggregate (the windowed pass cannot
    // give it exactly); SQL COUNT(DISTINCT) semantics — nulls excluded
    // (a dictionary stores the null marker out of band)
    val ndv = df.agg(countDistinct(col(c))).head().getLong(0)
    (n, ndv, internal + boundary + 1L)
  }
}
