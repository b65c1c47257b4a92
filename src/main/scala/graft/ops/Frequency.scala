package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Heavy-hitter (frequent-item) extraction: all values whose frequency
 * exceeds `support` × N, computed sketch-first so no exact per-value count
 * table is ever built for the long tail.
 *
 * Two passes, both distributed:
 *  1. CANDIDATES — `DataFrame.stat.freqItems` (Spark's implementation of
 *     the Karp–Shenker–Papadimitriou counter-decrement sketch): one scan,
 *     per-partition bounded state of ~1/support counters, merged
 *     associatively. Guarantee: every TRUE heavy hitter survives (no false
 *     negatives); some sub-threshold items may ride along.
 *  2. VERIFY — exact counts for the ≤ 1/support candidates only (an
 *     `isin` filter compiles to a pushed-down InSet; the groupBy touches
 *     candidate rows, not the tail), kept iff count > support × N, with N
 *     from a 1-row broadcast aggregate.
 *
 * The composition is EXACT and deterministic — the sketch only proposes;
 * every emitted (value, count) is an exact count over the data, so the
 * output is engine-independent (q82's DuckDB gate is a plain GROUP BY +
 * HAVING with no sketch at all). This is the same approximate-candidates /
 * exact-verify shape as the MinHash-LSH dedup path (SURVEY §7.3): the
 * sketch bounds the work, the verify pass owns the answer.
 *
 * At 100 TB: pass 1 state is O(1/support) per partition regardless of
 * cardinality; pass 2's aggregate is over a few hundred distinct keys —
 * the naive `groupBy(value).count.filter` instead materializes a
 * cardinality-of-the-column aggregate (billions of groups) to then throw
 * almost all of it away.
 */
object Frequency {

  def heavyHitters(df: DataFrame, valueCol: String,
                   support: Double): DataFrame = {
    require(support > 2e-4, s"support=$support below freqItems' floor")
    // pass 1: sketch candidates. Probed at support/2 so the exact
    // threshold sits strictly INSIDE the sketch's no-false-negative
    // guarantee, never on its boundary; state doubles to ~2/support
    // counters — still O(1) in the data.
    val candidates = df.stat.freqItems(Seq(valueCol), support / 2)
      .head().getSeq[Any](0)
    // pass 2: exact verify over candidates only
    val total = df.select(count(lit(1)).as("__n"))
    df.filter(col(valueCol).isin(candidates: _*))
      .groupBy(col(valueCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") > lit(support) * col("__n").cast("double"))
      .select(col(valueCol), col("cnt"))
  }
}
