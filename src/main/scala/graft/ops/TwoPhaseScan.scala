package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
private[ops] object TwoPhaseScan {

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
