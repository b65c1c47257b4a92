package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization (Jégou, Douze & Schmid 2011, "Product Quantization
 * for Nearest Neighbor Search") — the memory-compression half of a
 * billion-vector ANN index: split each D-dim vector into M subvectors,
 * replace every subvector with the id of its nearest codebook centroid
 * (D·4 bytes → M code bytes), and answer queries with the ASYMMETRIC
 * distance computation (ADC): the query precomputes its distance to every
 * centroid of every subspace (an M×K table, a few KB), and each database
 * vector's approximate distance is the sum of M table lookups — no float
 * vectors are touched at scan time.
 *
 * 100 TB shape: the codebook is a deterministic, plan-time-small table
 * (M·K rows) that BROADCASTS to both the encode and the query stage; the
 * only table-sized operations are one posexplode (M rows per vector, no
 * exchange), one broadcast join, and one hash aggregate back to
 * (vector → codes). The ADC scan joins codes against the broadcast M×K
 * lookup and folds the M partial distances IN SUBSPACE ORDER (a sorted
 * array fold, not a floating SUM whose addend order the planner owns), so
 * the result is IEEE-bit-identical on any partitioning — the property the
 * oracle gate depends on.
 *
 * Codebook choice here is the deterministic "sampled codebook": the K
 * lowest-id vectors seed each subspace verbatim (k-means-- with zero
 * Lloyd rounds). Real deployments refine seeds with [[Cluster]]'s exact
 * Lloyd step; the encode/ADC contract is identical either way, and
 * determinism is what makes the gate exact.
 */
object Pq {

  /** Subvector slices of `vecCol` as (id, [keep...,] m, sub): map-side
    * posexplode, one output row per subspace. `dim` must be divisible by
    * `m`; `keep` carries payload columns through. */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
                         dim: Int, m: Int,
                         keep: Seq[String] = Nil): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by M $m")
    val sub = dim / m
    df.select((col(idCol) +: keep.map(col) :+
      posexplode(array((0 until m).map(i =>
        slice(col(vecCol), i * sub + 1, sub)): _*)).as(Seq("m", "sub"))): _*)
  }

  /** The (m, code_id, codevec) codebook: subvectors of the `k` lowest-id
    * rows, code_id = that id's rank (0-based). Deterministic and tiny. */
  def sampledCodebook(df: DataFrame, idCol: String, vecCol: String,
                      dim: Int, m: Int, k: Int): DataFrame = {
    val seeds = df.orderBy(col(idCol)).limit(k)
      .withColumn("code_id",
        row_number().over(Window.orderBy(col(idCol))) - 1)
    subvectors(seeds, "code_id", vecCol, dim, m)
      .select(col("m"), col("code_id"), col("sub").as("codevec"))
  }

  /** Exact squared L2 distance between two float-array columns, folded in
    * index order (cast-to-double-first, d*d, left fold — the q28 oracle
    * arithmetic convention). */
  def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0d), (acc, d) => acc + d)

  /** PQ codes (id, [keep...,] m, code_id): nearest centroid per subspace,
    * ties to the lowest code_id. The codebook side broadcasts; the rank-1
    * filter is a WindowGroupLimit over M·K rows per vector. `keep`
    * carries per-id payload columns (e.g. the IVF cell) through without
    * a re-join. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebook: DataFrame, dim: Int, m: Int,
             keep: Seq[String] = Nil): DataFrame =
    subvectors(df, idCol, vecCol, dim, m, keep)
      .join(broadcast(codebook), "m")
      .withColumn("dist", sqDist(col("sub"), col("codevec")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol), col("m"))
          .orderBy(col("dist"), col("code_id"))))
      .filter(col("rn") === 1)
      .select((col(idCol) +: keep.map(col) :+ col("m") :+ col("code_id")): _*)

  /**
   * ADC top-k: approximate squared distance of every encoded vector to the
   * constant `query` (M per-subspace lookup distances summed in subspace
   * order), smallest first, ties by id. Returns (id, adc_dist) × k.
   */
  def adcTopK(codes: DataFrame, idCol: String, codebook: DataFrame,
              query: Seq[Float], dim: Int, m: Int, k: Int): DataFrame = {
    val sub = dim / m
    val qArr = array(query.map(v => lit(v)): _*)
    val qdist = codebook
      .withColumn("qsub", slice(qArr, col("m") * sub + 1, lit(sub)))
      .withColumn("qd", sqDist(col("qsub"), col("codevec")))
      .select(col("m"), col("code_id"), col("qd"))
    codes.join(broadcast(qdist), Seq("m", "code_id"))
      .groupBy(col(idCol))
      .agg(aggregate(
          array_sort(collect_list(struct(col("m"), col("qd")))),
          lit(0.0d), (acc, s) => acc + s.getField("qd"))
        .as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
  }

  /** The IVF coarse quantizer's centroid table (cell_id, centvec): the
    * `nCells` lowest-id vectors verbatim — deterministic, like
    * [[sampledCodebook]]. */
  def coarseCentroids(df: DataFrame, idCol: String, vecCol: String,
                      nCells: Int): DataFrame =
    df.orderBy(col(idCol)).limit(nCells)
      .withColumn("cell_id", row_number().over(Window.orderBy(col(idCol))) - 1)
      .select(col("cell_id"), col(vecCol).as("centvec"))

  /** Cell assignment (cell_id, id, `keep`...): nearest centroid by
    * full-dimension squared L2, ties to the lowest cell id. Centroids
    * broadcast; `keep` lets a caller carry payload columns (e.g. the
    * vector itself) through the assignment without a later re-join. */
  def coarseAssign(df: DataFrame, idCol: String, vecCol: String,
                   centroids: DataFrame,
                   keep: Seq[String] = Nil): DataFrame =
    df.join(broadcast(centroids))
      .withColumn("cdist", sqDist(col(vecCol), col("centvec")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("cdist"), col("cell_id"))))
      .filter(col("rn") === 1)
      .select((col("cell_id") +: col(idCol) +: keep.map(col)): _*)

  /**
   * IVF-PQ search (FAISS's IndexIVFPQ shape, by_residual=false): the
   * coarse quantizer routes the query to its `nProbe` nearest cells, only
   * THOSE cells' vectors are candidates, and candidates rank by the PQ
   * codes' ADC distance — at corpus scale the scan touches
   * nProbe/nCells of the rows and reads M code bytes per row, never a
   * float vector. Probed cells are chosen IN-PLAN (a rank over the
   * nCells-row broadcast centroid table — no driver collect), candidates
   * by broadcast semi-join on cell_id.
   */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
                query: Seq[Float], dim: Int, m: Int, codebookK: Int,
                nCells: Int, nProbe: Int, k: Int): DataFrame = {
    val centroids = coarseCentroids(df, idCol, vecCol, nCells)
    val qArr = array(query.map(v => lit(v)): _*)
    val probed = centroids
      .withColumn("qcd", sqDist(qArr, col("centvec")))
      .withColumn("prank", row_number().over(
        Window.orderBy(col("qcd"), col("cell_id"))))
      .filter(col("prank") <= nProbe)
      .select(col("cell_id"))
    // assignment KEEPS the vector, so candidate selection is one
    // nProbe-row broadcast semi-join — no table-sized join anywhere, and
    // the non-probed ~(1 − nProbe/nCells) of the corpus dies before the
    // encode stage (in production the codes are the stored index; encoding
    // only the probed cells' rows is the value-identical in-query twin)
    val candVecs = coarseAssign(df, idCol, vecCol, centroids,
        keep = Seq(vecCol))
      .join(broadcast(probed), Seq("cell_id"), "left_semi")
      .select(col(idCol), col(vecCol))
    val codebook = sampledCodebook(df, idCol, vecCol, dim, m, codebookK)
    val codes = encode(candVecs, idCol, vecCol, codebook, dim, m)
    adcTopK(codes, idCol, codebook, query, dim, m, k)
  }

  /**
   * RESIDUAL IVF-PQ (FAISS's by_residual=true default): PQ quantizes the
   * residual `vec − centroid(cell)` instead of the raw vector — the
   * residual distribution is tighter, so the same code budget loses less
   * — and the query side precomputes a PER-CELL lookup table (the
   * query's residual differs per cell), still only nCells·M·K doubles of
   * broadcast metadata. One SHARED residual codebook across cells
   * (seeded from the `codebookK` lowest-id vectors' residuals); all
   * subtraction chains fold left in declared order so the oracle can
   * replay them IEEE-exactly.
   */
  def ivfPqResidualTopK(df: DataFrame, idCol: String, vecCol: String,
                        query: Seq[Float], dim: Int, m: Int,
                        codebookK: Int, nCells: Int, nProbe: Int,
                        k: Int): DataFrame = {
    val sub = dim / m
    val centroids = coarseCentroids(df, idCol, vecCol, nCells)
    val qArr = array(query.map(v => lit(v)): _*)
    val probed = centroids
      .withColumn("qcd", sqDist(qArr, col("centvec")))
      .withColumn("prank", row_number().over(
        Window.orderBy(col("qcd"), col("cell_id"))))
      .filter(col("prank") <= nProbe)
      .select(col("cell_id"))

    // residual = vec − assigned centroid, element-wise in DOUBLE
    val resid = coarseAssign(df, idCol, vecCol, centroids,
        keep = Seq(vecCol))
      .join(broadcast(centroids), Seq("cell_id"))
      .withColumn("resid", zip_with(col(vecCol), col("centvec"),
        (x, y) => x.cast("double") - y.cast("double")))
      .select(col("cell_id"), col(idCol), col("resid"))

    // resid feeds BOTH the codebook seeds and the candidate encode —
    // stage it so the cross-join assignment runs once, not per branch
    CacheScope.withStages(resid) {
      val codebook = sampledCodebook(resid, idCol, "resid", dim, m,
        codebookK)
      val candResid = resid.join(broadcast(probed), Seq("cell_id"),
        "left_semi")
      val codes = encode(candResid, idCol, "resid", codebook, dim, m,
        keep = Seq("cell_id"))

      // per-cell query-residual lookup: dist((q − cent)_m, codevec)
      val qdist = centroids.crossJoin(broadcast(codebook))
        .withColumn("qressub", zip_with(
          slice(qArr, col("m") * sub + 1, lit(sub)),
          slice(col("centvec"), col("m") * sub + 1, lit(sub)),
          (x, y) => x.cast("double") - y.cast("double")))
        .withColumn("qd", sqDist(col("qressub"), col("codevec")))
        .select(col("cell_id"), col("m"), col("code_id"), col("qd"))

      CacheScope.pin(codes
        .join(broadcast(qdist), Seq("cell_id", "m", "code_id"))
        .groupBy(col(idCol))
        .agg(aggregate(
            array_sort(collect_list(struct(col("m"), col("qd")))),
            lit(0.0d), (acc, s) => acc + s.getField("qd"))
          .as("adc_dist"))
        .orderBy(col("adc_dist"), col(idCol))
        .limit(k))
    }
  }
}
