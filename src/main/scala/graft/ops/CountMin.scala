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
 * (`((a_d · k + b_d) mod P) mod width`, P = 2^61−1 prime, products of a
 * ≤61-bit prime by a long key reach ~2^124 and ride DECIMAL(38,0) —
 * capacity ~2^126 — so nothing overflows), NOT a black-box murmur — so
 * the DuckDB oracle replays the exact same sketch cell-for-cell (HUGEINT
 * arithmetic on its side), and merge order cannot change any counter
 * (sums commute). No floating point anywhere.
 *
 * Why the 61-bit modulus (round-9 advice): with P = 2^31−1 the family
 * reduced the key mod P FIRST, so any two keys congruent mod 2^31−1
 * collided in EVERY hash row — a cross-row correlation no depth can
 * minimize away once keys exceed ~2.1e9 (any real 64-bit id space).
 * Under P = 2^61−1 the full long key domain is below the modulus, so
 * the pairwise-independence argument holds for every representable key.
 *
 * Reference scope: the reference engine has no sketches at all
 * (trends.go's only aggregate is COUNT(*), /root/reference/trends.go:450)
 * — this op is part of the training-data-pipeline tier the engine adds.
 */
object CountMin {

  /** Mersenne prime 2^61−1: a universal-hash modulus ABOVE the whole
    * long key domain (|k| < P), so no two distinct keys are congruent
    * before hashing. */
  val P: Long = 2305843009213693951L

  /** Fixed prime multipliers / offsets per hash row (any values in [1,P)
    * work; pinned constants keep the sketch reproducible everywhere). */
  val As: Seq[Long] = Seq(100000000000000003L, 300000000000000011L,
    700000000000000033L, 1200000000000000011L)
  val Bs: Seq[Long] = Seq(10000000000000061L, 50000000000000051L,
    900000000000000059L, 1500000000000000041L)

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
