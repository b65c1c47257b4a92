package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over an embedding column (`array<float>`) — north-star
 * extension. Two paths:
 *
 *  - brute-force cosine top-k: exact baseline, O(N) per query, fully
 *    codegen'd array arithmetic (no UDF);
 *  - sign-LSH (random-hyperplane) bucketing: the scale path — probe only
 *    buckets within small Hamming distance of the query's bucket. At 100 TB
 *    the table is written bucketed by `signBucket`, so a query touches a
 *    handful of partitions instead of the full corpus (an IVF-style index
 *    expressed as partition pruning).
 *
 * All arithmetic is double-precision and sequential (index order), so
 * results are deterministic across partitionings.
 */
object Similarity {

  /** Dot product of two array<float/double> columns (element order) — the
    * native fused-loop expression (graft.functions.DotProduct), resolved
    * through the session function registry; registration is idempotent.
    * The equivalent builtin chain is kept below for the equivalence spec. */
  def dot(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("vec_dot", a, b)
  }

  /** The builtin-only formulation (allocates the zipped array per row) —
    * retained as the semantic reference for FunctionsSpec. */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — the fused single-loop native expression
    * (graft.functions.CosineSim): one traversal of both buffers instead of
    * the three [[dot]] calls of [[cosineChain]]; bit-identical
    * (FunctionsSpec). */
  def cosine(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("cosine_sim", a, b)
  }

  /** The three-dot formulation — retained as the semantic reference for
    * FunctionsSpec' bit-equality proof. */
  def cosineChain(a: Column, b: Column): Column =
    dot(a, b) / (l2(a) * l2(b))

  /**
   * Exact brute-force top-k neighbors of `queryVec` (a literal vector).
   * Plan shape: one scan + TakeOrderedAndProject — no shuffle of the corpus,
   * only the k winners move.
   */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     queryVec: Seq[Float], k: Int): DataFrame = {
    val q = array(queryVec.map(v => lit(v.toDouble)): _*)
    embeddings
      .withColumn("cos_sim", cosine(col(vecCol), q))
      .select(col(idCol), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /**
   * Axis-aligned sign-LSH bucket id: bit p = sign(vec[p·stride]). For
   * cosine similarity each coordinate axis IS a valid random-hyperplane
   * draw when the corpus is isotropic (mean-zero, no preferred axis) — the
   * degenerate-but-legitimate member of the SRP-LSH family. Two practical
   * properties:
   *  - engine-reproducible: a SQL oracle can compute the identical bucket
   *    (`embedding[j] > 0`), so the WHOLE ANN pipeline (prune + exact
   *    re-rank) is hash-checkable, unlike the murmur3 variant below;
   *  - storage-friendly: the bucket is a stable small int — the natural
   *    partition key for an IVF-style bucketed table (BucketedAnn).
   * On anisotropic real-world embeddings, apply a seeded random rotation
   * first (or use [[signBucket]]); the probe logic is unchanged.
   */
  def axisSignBucket(vec: Column, nPlanes: Int, stride: Int): Column =
    (0 until nPlanes).map { p =>
      when(element_at(vec, p * stride + 1) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucket of a literal query vector, computed at plan time. */
  def axisSignBucketOf(vec: Seq[Float], nPlanes: Int, stride: Int): Long =
    (0 until nPlanes).map(p => if (vec(p * stride) > 0) 1L << p else 0L).sum

  // --- seeded-rotation sign-LSH -------------------------------------------

  /**
   * Deterministic seeded projection matrix (nPlanes × dim): the "random
   * rotation" that anisotropy-proofs [[axisSignBucket]]. Each weight is a
   * splitmix64 draw mapped to [-0.5, 0.5) — a fixed, seed-reproducible
   * matrix whose rows are the hyperplane normals (true SRP-LSH; for sign
   * tests orthonormality buys nothing, only direction diversity does).
   * The weights are plan-time LITERALS, so both the Spark plan and a SQL
   * oracle can embed the identical matrix — the whole rotated pipeline
   * stays hash-checkable, unlike murmur-per-row [[signBucket]].
   */
  def seededPlanes(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] = {
    var x = seed
    def next(): Long = { // splitmix64 — public-domain PRNG step
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.fill(nPlanes, dim)((next() >>> 11).toDouble / (1L << 53) - 0.5)
  }

  /** Rotated sign-LSH bucket: bit p = sign(planes(p) · vec). The dot
    * product is a sequential left fold (zip_with + aggregate), bit-matched
    * by [[rotSignBucketOf]] and by a SQL list_sum over the same literals. */
  def rotSignBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (w, p) =>
      val wLit = array(w.map(lit): _*)
      val proj = aggregate(
        zip_with(vec, wLit, (x, ww) => x.cast(DoubleType) * ww),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Driver-side bucket of a literal query vector — same fold order as
    * [[rotSignBucket]]'s aggregate, so the sign test is bit-identical. */
  def rotSignBucketOf(vec: Seq[Float], planes: Array[Array[Double]]): Long =
    planes.zipWithIndex.map { case (w, p) =>
      val proj = vec.zip(w).foldLeft(0.0) { case (acc, (x, ww)) =>
        acc + x.toDouble * ww
      }
      if (proj > 0) 1L << p else 0L
    }.sum

  /**
   * ANN top-k via seeded-rotation sign-LSH — [[axisLshTopK]] with the
   * seeded projection in front, for corpora where the coordinate axes are
   * NOT isotropic (correlated dims, all-positive embeddings, a dominant
   * axis): the rotation mixes every dimension into each bucket bit, so
   * bucket occupancy stays balanced where raw axis signs would collapse
   * into a handful of buckets. Same contract: exact top-k OF THE PROBED
   * BUCKETS, SQL-reproducible from the literal matrix.
   */
  def rotLshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                 queryVec: Seq[Float], k: Int, seed: Long,
                 nPlanes: Int = 8, maxHamming: Int = 3): DataFrame = {
    val planes = seededPlanes(seed, nPlanes, queryVec.length)
    val q = array(queryVec.map(v => lit(v.toDouble)): _*)
    val qBucket = rotSignBucketOf(queryVec, planes)
    val ball = hammingBall(qBucket, nPlanes, maxHamming)
    embeddings
      .withColumn("bucket", rotSignBucket(col(vecCol), planes))
      .filter(col("bucket").isin(ball: _*))
      .withColumn("cos_sim", cosine(col(vecCol), q))
      .select(col(idCol), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** All buckets within Hamming distance `maxHamming` of `center` — the
    * probe set, enumerable at plan time for a literal query (2^nPlanes ids). */
  def hammingBall(center: Long, nPlanes: Int, maxHamming: Int): Seq[Long] =
    (0L until (1L << nPlanes))
      .filter(b => java.lang.Long.bitCount(b ^ center) <= maxHamming)

  /**
   * Sign-LSH bucket id: one bit per pseudo-random hyperplane. Hyperplane
   * h_i's components are derived deterministically from murmur3(i, dim) —
   * no RNG state to ship to executors.
   */
  def signBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      // pseudo-hyperplane component j = hash(p, j) mapped to [-0.5, 0.5)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, j) => x.cast(DoubleType) *
            ((pmod(hash(lit(p), j), lit(1000000)).cast(DoubleType) / 1000000.0) - 0.5)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /**
   * ANN top-k via axis-sign LSH: candidates = vectors whose bucket is within
   * `maxHamming` bits of the query's bucket (a plan-time literal IN-list —
   * pushdown-friendly), then exact cosine re-rank of the survivors. The
   * output contract is "exact top-k OF THE PROBED BUCKETS", which a SQL
   * oracle reproduces bit-for-bit; recall vs the full corpus is the usual
   * LSH probe tradeoff (nPlanes, maxHamming).
   */
  def axisLshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                  queryVec: Seq[Float], k: Int,
                  nPlanes: Int = 8, maxHamming: Int = 3): DataFrame = {
    val dim = queryVec.length
    val stride = dim / nPlanes
    val q = array(queryVec.map(v => lit(v.toDouble)): _*)
    val qBucket = axisSignBucketOf(queryVec, nPlanes, stride)
    val ball = hammingBall(qBucket, nPlanes, maxHamming)
    embeddings
      .withColumn("bucket", axisSignBucket(col(vecCol), nPlanes, stride))
      .filter(col("bucket").isin(ball: _*))
      .withColumn("cos_sim", cosine(col(vecCol), q))
      .select(col(idCol), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /**
   * Probe-cost diagnostics for [[axisLshTopK]]: buckets the Hamming ball
   * expands to, and candidate rows the bucket filter feeds the exact
   * re-rank — the recall/cost observability a production ANN surfaces.
   */
  def axisLshProbeStats(embeddings: DataFrame, vecCol: String,
                        queryVec: Seq[Float],
                        nPlanes: Int = 8, maxHamming: Int = 3): DataFrame = {
    val stride = queryVec.length / nPlanes
    val qBucket = axisSignBucketOf(queryVec, nPlanes, stride)
    val ball = hammingBall(qBucket, nPlanes, maxHamming)
    embeddings
      .withColumn("bucket", axisSignBucket(col(vecCol), nPlanes, stride))
      .filter(col("bucket").isin(ball: _*))
      .agg(count(lit(1)).as("n_candidates"))
      .select(lit(ball.size).cast(LongType).as("n_buckets_probed"),
        col("n_candidates"))
  }

  /**
   * ANN top-k via sign-LSH: restrict the candidate set to vectors whose
   * bucket is within `maxHamming` bits of the query's bucket, then exact
   * cosine on the survivors. Recall/probe tradeoff = (nPlanes, maxHamming).
   */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryVec: Seq[Float], k: Int,
              nPlanes: Int = 8, maxHamming: Int = 2): DataFrame = {
    val dim = queryVec.length
    val q = array(queryVec.map(v => lit(v.toDouble)): _*)
    val qBucket = signBucket(q, nPlanes, dim)
    embeddings
      .withColumn("bucket", signBucket(col(vecCol), nPlanes, dim))
      .filter(bit_count(col("bucket").bitwiseXOR(qBucket)) <= maxHamming)
      .withColumn("cos_sim", cosine(col(vecCol), q))
      .select(col(idCol), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /**
   * Embedding-cosine near-dup pairs blocked by the AXIS sign bucket — the
   * engine-reproducible variant of [[cosineNearDupPairs]]: the block, the
   * candidate set and the cosine verify are all SQL-expressible, so the
   * whole operator is oracle-checkable (contract = "pairs ≥ threshold that
   * share a bucket"). Fewer planes ⇒ bigger blocks ⇒ higher recall at more
   * comparisons; same O(N²/2^nPlanes) shape as any single-table LSH block.
   */
  /**
   * IVF-style centroid assignment: each vector joins the cell of its
   * most-similar centroid (argmax cosine; ties → lowest centroid index,
   * the `array_position`-first-max rule). Centroids are caller-supplied
   * literals — deterministic, plan-time constants, no k-means job and no
   * collect — so scoring is MAP-ONLY: K fused-cosine evaluations per row
   * inside one codegen stage.
   */
  def centroidAssign(embeddings: DataFrame, idCol: String, vecCol: String,
                     centroids: Seq[Seq[Double]]): DataFrame = {
    val sims = array(centroids.map(c =>
      cosine(col(vecCol), array(c.map(lit): _*))): _*)
    embeddings
      .withColumn("__sims", sims)
      .withColumn("cluster",
        (array_position(col("__sims"), array_max(col("__sims"))) - 1)
          .cast("int"))
      .drop("__sims")
  }

  /**
   * Semantic near-dup pairs, IVF-partitioned: same-cell self-join + exact
   * cosine ≥ `threshold` — the coarse-quantizer variant of
   * [[axisCosineNearDupPairs]] (data-adapted cells vs fixed sign planes).
   * Cost is Σ |cell|² instead of n²; the recall contract is "pairs whose
   * members quantize to the same cell" (cross-cell near-dups need
   * multi-probe, same trade as every IVF index). One shuffle on the cell
   * id; at 100 TB the cell census (q85's companion stats) is the skew
   * check — an oversized cell means more centroids, not a bigger reducer.
   */
  def ivfNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                      centroids: Seq[Seq[Double]],
                      threshold: Double): DataFrame = {
    val base = centroidAssign(
      embeddings.select(col(idCol).as("id"), col(vecCol).as("vec")),
      "id", "vec", centroids)
    val a = base.select(col("cluster"), col("id").as("id_a"),
      col("vec").as("vec_a"))
    val b = base.select(col("cluster"), col("id").as("id_b"),
      col("vec").as("vec_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cluster"), col("cos_sim"))
  }

  def axisCosineNearDupPairs(embeddings: DataFrame, idCol: String,
                             vecCol: String, threshold: Double,
                             nPlanes: Int, stride: Int): DataFrame = {
    val base = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", axisSignBucket(col("vec"), nPlanes, stride))
    val a = base.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = base.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .dropDuplicates("id_a", "id_b")
  }

  /**
   * Embedding-cosine near-duplicate pairs, LSH-blocked: same banding trick
   * as Dedup — pairs sharing a sign-bucket are candidates, verified with
   * exact cosine ≥ threshold. (Exact variant of "embedding near-dup" for
   * corpora where text dedup misses paraphrases.)
   */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nPlanes: Int = 8,
                         dim: Int = 64): DataFrame = {
    val base = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", signBucket(col("vec"), nPlanes, dim))
    val a = base.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = base.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .dropDuplicates("id_a", "id_b")
  }
}
