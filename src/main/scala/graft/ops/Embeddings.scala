package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding-column aggregation: per-label centroids over an
 * `Array[Float]` column — the building block of IVF training, class
 * prototypes, and drift monitoring.
 *
 * Distributed float addition is NOT associative, so a naive per-element
 * double sum changes with shuffle order (and between engines). The
 * reproducible path quantizes each component to a fixed-point BIGINT
 * first — `floor(val · 10^scale)` is one exact IEEE multiply + floor,
 * identical everywhere — then sums EXACT integers (order-free) and
 * divides once at the end. The gate (q74) rides this variant; when
 * bit-reproducibility doesn't matter, swap the quantize for a plain
 * double sum and keep the same shape.
 *
 * Scale shape: posexplode is map-only (rows × dims, but narrow);
 * one shuffle on (label, pos) with map-side partials; output is
 * |labels| × dims rows — tiny. No vector ever materializes on the
 * driver.
 */
object Embeddings {

  /** Per-(label, dimension) fixed-point centroid: label, pos (0-based),
    * n, mean (= Σ floor(val·10^scale) / (n·10^scale), as double). */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String,
                     scale: Int = 6): DataFrame = {
    val factor = math.pow(10, scale)
    df.select(col(labelCol),
        posexplode(col(vecCol)).as(Seq("pos", "val")))
      .select(col(labelCol), col("pos").cast("long").as("pos"),
        floor(col("val").cast("double") * factor).as("q"))
      .groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("qsum"))
      .select(col(labelCol), col("pos"), col("n"),
        (col("qsum").cast("double") / (col("n") * lit(factor)))
          .as("mean"))
  }
}
