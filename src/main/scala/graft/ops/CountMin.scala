package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-Min sketch over a keyed long column — the classic streaming /
 * mergeable frequency summary (Cormode & Muthukrishnan 2005): `depth`
 * pairwise-independent hash rows × `width` counters; a key's estimate is
 * the MIN of its `depth` counters and never underestimates.
 *
 * Spark shape: building the sketch IS one hash aggregation —
 * explode each row into `depth` (row, bucket) cells and `GROUP BY`;
 * Catalyst's partial aggregation makes every map task emit at most
 * `depth × width` partial cells (the sketch is a monoid — counter-wise
 * sum — so map-side combine IS the sketch merge), and the shuffle is
 * bounded by `depth × width × #tasks` regardless of input rows. That is
 * the 100 TB story: the data is touched once, everything after the scan
 * is metadata-sized.
 *
 * Determinism: the hash family is explicit modular arithmetic
 * (`((a_d · k + b_d) mod P) mod width`, P = 2^31−1 prime, products of a
 * 31-bit prime by a long key ride DECIMAL(38,0) so nothing overflows),
 * NOT a black-box murmur — so the DuckDB oracle replays the exact same
 * sketch cell-for-cell, and merge order cannot change any counter (sums
 * commute). No floating point anywhere.
 *
 * Reference scope: the reference engine has no sketches at all
 * (trends.go's only aggregate is COUNT(*), /root/reference/trends.go:450)
 * — this op is part of the training-data-pipeline tier the engine adds.
 */
object CountMin {

  /** Mersenne prime 2^31−1: the classic universal-hash modulus. */
  val P: Long = 2147483647L

  /** Fixed odd multipliers / offsets per hash row (any values in [1,P)
    * work; pinned constants keep the sketch reproducible everywhere). */
  val As: Seq[Long] = Seq(1299709L, 15485863L, 32452843L, 49979687L)
  val Bs: Seq[Long] = Seq(104729L, 1299721L, 15485917L, 32452867L)

  /** The bucket column for hash row `d` over key column `k` — exact
    * integer arithmetic end to end (DECIMAL(38,0) products). */
  def bucket(k: Column, d: Int, width: Int): Column =
    pmod(
      pmod(k.cast("decimal(38,0)") * lit(As(d)) + lit(Bs(d)), lit(P))
        .cast("long"),
      lit(width))

  /**
   * Build the sketch: one row per non-empty cell,
   * (d, bucket, n = Σ weight). Weight 1 per row unless `weight` given.
   */
  def build(df: DataFrame, key: Column, depth: Int, width: Int,
            weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && depth <= As.length, s"depth 1..${As.length}")
    val cells = df.select(key.as("__k"), weight.cast("long").as("__w"))
      .select(explode(array((0 until depth).map { d =>
        struct(lit(d).as("d"), bucket(col("__k"), d, width).as("bucket"),
          col("__w").as("w"))
      }: _*)).as("c"))
    cells.groupBy(col("c.d").as("d"), col("c.bucket").as("bucket"))
      .agg(sum(col("c.w")).as("n"))
  }

  /**
   * Point estimates for `probes` (a frame with a long `k` column):
   * est = min over d of the key's cell (a missing cell is 0 — the key
   * hashed to a counter nothing incremented). The sketch side is
   * depth×width rows — broadcastable metadata; the probe join never
   * shuffles the sketch.
   */
  def estimate(sketch: DataFrame, probes: DataFrame, key: Column,
               depth: Int, width: Int): DataFrame = {
    val keyed = probes.select(key.as("k")).distinct()
      .select(col("k"), explode(array((0 until depth).map { d =>
        struct(lit(d).as("d"), bucket(col("k"), d, width).as("bucket"))
      }: _*)).as("c"))
      .select(col("k"), col("c.d").as("d"), col("c.bucket").as("bucket"))
    keyed.join(broadcast(sketch), Seq("d", "bucket"), "left_outer")
      .groupBy(col("k"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
