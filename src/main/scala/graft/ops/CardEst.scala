package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Join-cardinality estimation audit — the consumer of the optimizer
 * statistics this engine already collects (q173's equi-depth histogram,
 * q175's NDV/MCVs): the textbook Selinger estimate
 *
 *   |R ⋈ S| ≈ n_R · n_S / max(ndv_R.k, ndv_S.k)
 *
 * next to the EXACT join cardinality, so the report quantifies exactly
 * how far uniform-distribution planning is from reality on each join —
 * tight on FK joins (containment holds, every key unique on one side),
 * badly low on skewed self-joins (the failure mode MCVs exist to fix).
 *
 * Scale shape: the estimate is metadata (one aggregate per side); the
 * EXACT cardinality never materializes the join — it is
 * Σ_k c_R(k)·c_S(k) over the per-key count tables, i.e. two map-side-
 * combined aggregates and a join of key-count tables whose size is
 * NDV(k), not rows. The oracle computes the same number by brute
 * row-level JOIN + count — an independent check that the product-sum
 * identity holds. All arithmetic integer; the n_R·n_S product rides
 * DECIMAL(38,0) (it overflows a long at warehouse row counts).
 */
object CardEst {

  /** One row: (join_name, n_left, n_right, ndv_left, ndv_right,
    * est_rows, actual_rows). */
  def joinSizeAudit(joinName: String,
                    left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String): DataFrame = {
    val d = "decimal(38,0)"
    val lc = left.select(col(leftKey).as("k")).filter(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("c_l"))
    val rc = right.select(col(rightKey).as("k")).filter(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("c_r"))
    val ls = lc.agg(coalesce(sum(col("c_l")), lit(0L)).cast("long")
        .as("n_left"),
      count(lit(1)).as("ndv_left"))
    val rs = rc.agg(coalesce(sum(col("c_r")), lit(0L)).cast("long")
        .as("n_right"),
      count(lit(1)).as("ndv_right"))
    val actual = lc.join(rc, "k")
      .agg(coalesce(sum(col("c_l").cast(d) * col("c_r")), lit(0).cast(d))
        .cast("long").as("actual_rows"))
    ls.crossJoin(broadcast(rs)).crossJoin(broadcast(actual)) // 1-row sides
      .select(lit(joinName).as("join_name"),
        col("n_left"), col("n_right"), col("ndv_left"), col("ndv_right"),
        // integral div (not decimal / + cast): both engines floor; an
        // empty side (ndv 0) reports 0, matching the oracle's count(*).
        // The BIGINT report column bounds the audit's domain at 9.2e18
        // output rows — beyond it the exact count is not computable
        // anyway; ANSI mode fails loudly rather than wrapping.
        when(greatest(col("ndv_left"), col("ndv_right")) > 0,
          expr("CAST((CAST(n_left AS DECIMAL(38,0)) * n_right) div " +
            "greatest(ndv_left, ndv_right) AS BIGINT)"))
          .otherwise(lit(0L)).as("est_rows"),
        col("actual_rows"))
  }
}
