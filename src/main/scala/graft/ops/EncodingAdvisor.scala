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
 * like every two-phase scan in the repo.
 *
 * FUSED across candidates (the shape a real ANALYZE uses): ONE
 * range-partitioned pass carries every candidate's change flags and
 * in-order first/last values side by side (the sort and shuffle are paid
 * once, not once per column), and ONE hash aggregate computes every
 * exact NDV (Spark plans multi-column COUNT(DISTINCT) as a single
 * Expand-based pass). K candidates = 2 jobs total, not 2·K — round 9's
 * per-column loop made q211 the priciest new query for no reason.
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
    val stats = profileAll(df, orderCols, candidates)
    val rows = candidates.map { c =>
      val (n, ndv, runs) = stats(c)
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
      : (Long, Long, Long) =
    profileAll(df, orderCols, Seq(c))(c)

  /** Spark null-safe equality (<=>) semantics on driver-side values:
    * null == null, NaN == NaN — the in-partition change flags use <=>,
    * so the boundary stitch must compare the same way (a Scala == here
    * counted a NaN|NaN partition boundary as a run change while the
    * same pair inside a partition was not — inconsistent run totals). */
  private def sameValue(x: Any, y: Any): Boolean = (x, y) match {
    case (null, null)           => true
    case (a: Double, b: Double) => a == b || (a.isNaN && b.isNaN)
    case (a: Float, b: Float)   => a == b || (a.isNaN && b.isNaN)
    // BinaryType surfaces as Array[Byte], whose == is reference
    // equality — without this case every partition boundary of a
    // binary candidate counted as a run change while <=> compared
    // in-partition pairs by value (the same inconsistency class the
    // NaN cases fix)
    case (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.equals(a, b)
    // DecimalType: <=> compares numerically, BigDecimal.equals also
    // compares scale (2.0 != 2.00) — use compareTo
    case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
      a.compareTo(b) == 0
    case _                      => x != null && x == y
  }

  /** Exact (n, ndv, runs-under-order) for EVERY candidate column from
    * one shared range-partitioned pass + one shared NDV aggregate. */
  def profileAll(df: DataFrame, orderCols: Seq[Column],
                 candidates: Seq[String]): Map[String, (Long, Long, Long)] = {
    val spark = df.sparkSession
    def vc(c: String) = s"__v_$c"
    val parted = df
      .select(candidates.map(c => col(c).as(vc(c))) ++ orderCols: _*)
      .repartitionByRange(
        spark.sessionState.conf.numShufflePartitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val rn = row_number().over(w)
    // per partition: rows, per-column internal changes (null-safe <=>
    // negation), per-column first/last value IN ORDER via min_by/max_by
    // on the order tuple (a bare first()/last() under hash aggregation
    // is order-free — the nondeterminism bug class this repo bans) —
    // ONE pass, #partitions rows out, all candidates side by side
    val ord = struct(orderCols: _*)
    val withChg = candidates.foldLeft(parted.withColumn("__rn", rn)) {
      (acc, c) =>
        acc.withColumn(s"__chg_$c",
          when(col("__rn") === 1, 0L)
            .otherwise(when(col(vc(c)) <=> lag(col(vc(c)), 1).over(w),
              0L).otherwise(1L)))
    }
    val aggs = count(lit(1)).as("__n") +: candidates.flatMap { c =>
      Seq(sum(col(s"__chg_$c")).as(s"__chgs_$c"),
        min_by(col(vc(c)), ord).as(s"__first_$c"),
        max_by(col(vc(c)), ord).as(s"__last_$c"))
    }
    val stats = withChg.groupBy(col("__pid"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("__pid"))
      .collect()
    val n = stats.map(_.getAs[Long]("__n")).sum
    // exact NDVs are ONE multi-distinct hash aggregate (Expand-planned
    // single data pass); SQL COUNT(DISTINCT) semantics — nulls excluded
    // (a dictionary stores the null marker out of band)
    val ndvRow =
      if (n == 0L) null
      else df.agg(countDistinct(col(candidates.head)),
        candidates.tail.map(c => countDistinct(col(c))): _*).head()
    candidates.zipWithIndex.map { case (c, i) =>
      if (n == 0L) c -> ((0L, 0L, 0L))
      else {
        val internal = stats.map(_.getAs[Long](s"__chgs_$c")).sum
        // boundary stitching: a change where partition p's last value
        // differs (Spark <=> semantics) from partition p+1's first
        val boundary = stats.sliding(2).count {
          case Array(a, b) => !sameValue(
            a.getAs[Any](s"__last_$c"), b.getAs[Any](s"__first_$c"))
          case _ => false
        }
        c -> ((n, ndvRow.getLong(i), internal + boundary + 1L))
      }
    }.toMap
  }
}
