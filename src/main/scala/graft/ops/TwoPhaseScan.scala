package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The SHARED two-phase global-scan scaffold behind [[GlobalIndex]]'s row
 * numbering (count), [[Packing]]'s running token sums (sum) and
 * [[PrefixScan]]'s running maxima (max) — the standard distributed
 * answer to `agg OVER (ORDER BY …)` without the single-reducer window:
 *
 *   1. range-repartition on the order key + in-partition sort (sampled
 *      bounds → ordered AND balanced partitions), tagged with `__pid`;
 *   2. ONE per-partition partial-aggregate pass, collected to
 *      #partitions driver values (metadata, never rows);
 *   3. exclusive prefix-fold of the partials into per-partition OFFSETS,
 *      broadcast back for each caller's partitioned-window local pass.
 *
 * The fold works in Option[Long]: a partition whose partial is NULL
 * (e.g. an all-null max) contributes NOTHING — there is no fabricated
 * identity value (the bug class a bare getLong unboxing hides). Offsets
 * surface as (`__pid`, `__off`, `__has_off`); additive callers read
 * `__off` (0 when absent IS the + identity), order-statistic callers
 * must consult `__has_off`.
 *
 * Both passes run inside one [[CacheScope.withStages]] scope so they see
 * a single row→partition assignment; callers pin their result before the
 * scope closes.
 */
private[graft] object TwoPhaseScan {

  /**
   * LAZY in-plan running sums over ONE global order — the
   * `sum(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)` shape without the
   * single-reducer window AND without [[scan]]'s eager scaffold (persist +
   * partials collect): nothing here runs a job at build time, the whole
   * thing is one lazy plan a caller can keep composing.
   *
   *   1. range-repartition on the order key (sampled bounds → ordered,
   *      balanced buckets), tag rows with the bucket id
   *      (`spark_partition_id()` — the partition count is passed
   *      explicitly, so AQE never re-coalesces the buckets out from under
   *      the tag);
   *   2. per-bucket local running sums: one hash exchange on the bucket id
   *      (the Window's required clustering — it moves each bucket as a
   *      unit, balanced by construction) + one in-bucket sort, full
   *      parallelism at any data size;
   *   3. per-bucket totals re-aggregated from the range exchange (the
   *      subtree is identical in both branches, so ReuseExchange computes
   *      the base once), prefix-folded into exclusive bucket offsets in a
   *      window over ≤ numShufflePartitions rows — CONFIG-bounded metadata,
   *      never data (the [[WeightedMedian]] starts-table argument; stated
   *      by the constant partition key) — and broadcast back.
   *
   * Returns df's columns plus, per `(src, cum, tot)` entry of `sums`, the
   * running sum of `src` including the current row (`cum`) and its grand
   * total (`tot`). Contract: `orderCols` form a KEY of df (one row per
   * value — aggregate upstream; ties would make a running sum
   * row-order-dependent) and the summed columns are non-null longs.
   */
  def cumSums(df: DataFrame, orderCols: Seq[Column],
              sums: Seq[(String, String, String)]): DataFrame = {
    val spark = df.sparkSession
    val parted = df
      .repartitionByRange(
        spark.sessionState.conf.numShufflePartitions, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(parted) { case (d, (src, cum, _)) =>
      d.withColumn(s"__l_$src", sum(col(src)).over(wLoc))
    }
    val aggs = sums.map { case (src, _, _) => sum(col(src)).as(s"__t_$src") }
    val totals = parted.groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*)
    // the offsets fold runs in ONE partition over ≤ numShufflePartitions
    // rows — bounded by CONFIG, never data. The partition key is a
    // __pid-derived constant (pmod(pid, 1) ≡ 0) rather than a bare
    // literal: a foldable key would be optimized away into an EMPTY
    // partition spec, which both re-triggers WindowExec's
    // no-partition-defined warning (reserved for genuinely unbounded
    // frames) and hides the stated boundedness from the plan.
    val offKey = pmod(col("__pid"), lit(1))
    val wOff = Window.partitionBy(offKey).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(offKey)
    val offsets = sums.foldLeft(totals) { case (d, (src, _, tot)) =>
      d.withColumn(s"__o_$src",
          coalesce(sum(col(s"__t_$src")).over(wOff), lit(0L)))
        .withColumn(tot, sum(col(s"__t_$src")).over(wAll))
    }.select(col("__pid") +: sums.flatMap { case (src, _, tot) =>
      Seq(col(s"__o_$src"), col(tot)) }: _*)
    local.join(broadcast(offsets), Seq("__pid"))
      .select(df.columns.map(col) ++ sums.flatMap { case (src, cum, tot) =>
        Seq((col(s"__l_$src") + col(s"__o_$src")).as(cum), col(tot)) }: _*)
  }

  /**
   * Run `body(parted, offsetsDf, total)` inside the staged scope:
   * `parted` is the sorted `__pid`-tagged frame, `offsetsDf` the
   * exclusive-prefix offsets under `combine`, `total` the fold of ALL
   * partials (None when every partial is null — e.g. an empty frame).
   */
  def scan[R](df: DataFrame, orderCols: Seq[Column], partialAgg: Column,
              combine: (Long, Long) => Long)
             (body: (DataFrame, DataFrame, Option[Long]) => R): R = {
    val spark = df.sparkSession
    val parted = df
      .repartitionByRange(
        spark.sessionState.conf.numShufflePartitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    CacheScope.withStages(parted) {
      val partials = parted.groupBy(col("__pid")).agg(partialAgg.as("__a"))
        .collect().map(r => (r.getInt(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).sortBy(_._1)
      val offsets = partials.map(_._1).zip(
        partials.map(_._2).scanLeft(Option.empty[Long]) {
          case (acc, m) => m.fold(acc)(v => Some(acc.fold(v)(combine(_, v))))
        }.init)
      val offsetsDf = spark.createDataFrame(offsets.toSeq.map {
          case (p, o) => (p, o.getOrElse(0L), o.isDefined) })
        .toDF("__pid", "__off", "__has_off")
      val total = partials.flatMap(_._2).reduceOption(combine)
      body(parted, broadcast(offsetsDf), total)
    }
  }
}
