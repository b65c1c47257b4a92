package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random corpus (seeded — no runtime RNG)
  private val dim = 16
  private lazy val vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(42)
    (0L until 200L).map(i => i -> Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  test("cosine matches a plain Scala computation") {
    val a = vecs(1)._2.map(_.toDouble)
    val b = vecs(2)._2.map(_.toDouble)
    val expected = a.zip(b).map { case (x, y) => x * y }.sum /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val got = df.filter($"vec_id" === 1)
      .crossJoin(df.filter($"vec_id" === 2).select($"embedding".as("b")))
      .select(Similarity.cosine($"embedding", $"b"))
      .collect().head.getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("brute-force top-k returns the true nearest neighbors, ordered") {
    val q = vecs(0)._2
    val topk = Similarity.bruteForceTopK(df.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, k = 5).collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      ad.zip(bd).map { case (x, y) => x * y }.sum /
        (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val expected = vecs.drop(1).map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(5)
    assert(topk.map(_.getAs[Long]("vec_id")).toSeq === expected.map(_._1))
    topk.zip(expected).foreach { case (row, (_, c)) =>
      assert(math.abs(row.getAs[Double]("cos_sim") - c) < 1e-12)
    }
  }

  test("sign-LSH ANN: subset of corpus probed, decent recall vs brute force") {
    val q = vecs(0)._2
    val brute = Similarity.bruteForceTopK(df.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val ann = Similarity.lshTopK(df.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, k = 10, nPlanes = 8, maxHamming = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ann.size === 10)
    assert((brute intersect ann).size >= 5) // recall ≥ 0.5 at these params
    // the probe set must actually prune: bucket filter keeps < full corpus
    val probed = df.withColumn("bucket",
        Similarity.signBucket($"embedding", 8, dim))
      .filter(bit_count($"bucket".bitwiseXOR(
        Similarity.signBucket(array(q.map(v => lit(v.toDouble)): _*), 8, dim))) <= 3)
      .count()
    assert(probed < 200)
  }

  // --- seeded rotation vs raw axis signs on an ANISOTROPIC corpus ---------

  /** A deliberately axis-correlated corpus: 10 clusters of 20 vectors in
    * 64 dims. The 8 dims axisSignBucket samples (0, 8, …, 56) carry ONLY
    * tiny iid noise (sign = coin flip per vector), while the other 56 dims
    * carry the cluster signal — so raw axis-sign buckets are pure noise
    * (neighbors land ~4 bits apart) while any direction that MIXES
    * dimensions sees the signal. All seeded, fully deterministic. */
  private lazy val skewedVecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    val sampled = (0 until 8).map(_ * 8).toSet
    val centers = Seq.fill(10)(Seq.tabulate(64)(j =>
      if (sampled(j)) 0f else (rnd.nextFloat() * 2 - 1)))
    (0L until 200L).map { i =>
      val c = centers((i % 10).toInt)
      i -> c.zipWithIndex.map { case (v, j) =>
        if (sampled(j)) (rnd.nextFloat() - 0.5f) * 0.02f
        else v + (rnd.nextFloat() - 0.5f) * 0.1f
      }
    }
  }

  test("seeded rotation rescues recall where raw axis buckets are noise") {
    val df64 = skewedVecs.toDF("vec_id", "embedding")
    val q = skewedVecs(0)._2 // a member of cluster 0
    val corpus = df64.filter($"vec_id" =!= 0)
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      q, k = 10).collect().map(_.getAs[Long]("vec_id")).toSet
    def recall(ann: Array[org.apache.spark.sql.Row]): Double =
      (ann.map(_.getAs[Long]("vec_id")).toSet intersect brute).size / 10.0
    val axis = recall(Similarity.axisLshTopK(corpus, "vec_id", "embedding",
      q, k = 10, nPlanes = 8, maxHamming = 1).collect())
    val rot = recall(Similarity.rotLshTopK(corpus, "vec_id", "embedding",
      q, k = 10, seed = 20260813L, nPlanes = 8, maxHamming = 1).collect())
    assert(rot >= 0.7, s"rotated recall $rot — rotation lost the cluster")
    assert(axis <= 0.3, s"axis recall $axis — corpus not adversarial enough")
    assert(rot > axis)
  }

  test("rotSignBucketOf matches the Column expression bit-for-bit") {
    val planes = Similarity.seededPlanes(99L, 8, 64)
    val got = skewedVecs.take(32).toDF("vec_id", "embedding")
      .select($"vec_id", Similarity.rotSignBucket($"embedding", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    skewedVecs.take(32).foreach { case (id, v) =>
      assert(got(id) === Similarity.rotSignBucketOf(v, planes),
        s"driver/executor bucket mismatch for vec $id")
    }
  }

  test("seededPlanes is deterministic per seed and spread in [-0.5, 0.5)") {
    val a = Similarity.seededPlanes(1L, 8, 64)
    val b = Similarity.seededPlanes(1L, 8, 64)
    val c = Similarity.seededPlanes(2L, 8, 64)
    assert(a.flatten.toSeq === b.flatten.toSeq)
    assert(a.flatten.toSeq !== c.flatten.toSeq)
    assert(a.flatten.forall(w => w >= -0.5 && w < 0.5))
    // no degenerate rows (a zero row would make a dead bucket bit)
    assert(a.forall(row => row.exists(math.abs(_) > 0.1)))
  }

  test("cosineNearDupPairs finds planted near-duplicates") {
    val planted = (df.select($"vec_id", $"embedding") union
      Seq((1000L, vecs(5)._2.map(x => x * 1.001f))).toDF("vec_id", "embedding"))
    val pairs = Similarity.cosineNearDupPairs(planted, "vec_id", "embedding",
        threshold = 0.999, nPlanes = 6, dim = dim)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((5L, 1000L)))
  }
}
