package graft

import org.apache.spark.sql.functions.col

import graft.ops.{Cluster, Curation}

/**
 * Connected components over near-dup pair graphs (Cluster) and the
 * transitive mode of the curation pipeline. The load-bearing semantic:
 * "keep one doc per duplicate cluster" is a statement about COMPONENTS —
 * for a hub doc C similar to both A and B (with A≁B), pair-local
 * drop-the-higher-id keeps {A, B} while the transitive closure keeps
 * exactly the component minimum {A}.
 */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = pairs.toDF("id_a", "id_b")
    val cc = Cluster.connectedComponents(df, "id_a", "id_b")
    val out = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc.unpersist(blocking = true)
    out
  }

  test("chain, hub, and disjoint components resolve to their minimum id") {
    val cc = components(Seq(
      (1L, 3L), (2L, 3L),            // hub: 3 similar to both 1 and 2
      (10L, 11L),                    // isolated pair
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), // 5-chain
      (31L, 30L)))                   // order within a pair is irrelevant
    assert(cc === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("pathological long chain converges (pointer jumping)") {
    // a 64-node path: pure neighbor propagation needs 63 rounds; with
    // pointer jumping the fixpoint lands well inside the round budget
    val chain = (0L until 63L).map(i => (i, i + 1))
    val cc = components(chain)
    assert(cc.size === 64 && cc.values.forall(_ === 0L))
  }

  test("no cached RDDs leak after the caller releases the result") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cc = Cluster.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"), "id_a", "id_b")
    cc.collect()
    cc.unpersist(blocking = true)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cache entries: $leaked")
  }

  // --- curation transitive mode ------------------------------------------

  /** Docs built so LSH finds exactly the pairs (1,3) and (2,3): doc 3 is
    * the concatenation of doc 1's and doc 2's word blocks (J(1,3) = J(2,3)
    * ≈ 0.49, J(1,2) = 0). English markers are woven in so the lang gate
    * passes; bands=32 (r=2) makes LSH recall at J≈0.49 effectively certain
    * (miss probability (1−0.49²)³² ≈ 2·10⁻⁴ per pair... per run, and the
    * minhash seeds are fixed, so the outcome is deterministic anyway). */
  private def hubDocs = {
    val m = (1 to 40).map(i => if (i % 7 == 0) "the" else s"ma$i")
    val n = (1 to 40).map(i => if (i % 7 == 0) "is" else s"nb$i")
    // "the"/"is" repeat at different neighbors, so A and B share no bigram
    Seq(
      (1L, m.mkString(" ")),
      (2L, n.mkString(" ")),
      (3L, (m ++ n).mkString(" "))).toDF("doc_id", "text")
  }

  test("curate pair mode keeps both endpoints of a hub; transitive keeps the component min") {
    val pair = Curation.curate(hubDocs, "doc_id", "text",
      minQuality = 0.0, nearDupThreshold = 0.4, transitive = false,
      lshBands = 32)
    val pairIds = pair.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    pair.unpersist(blocking = true)
    assert(pairIds === Set(1L, 2L),
      "pair mode drops only docs appearing as the higher id of a pair")

    val trans = Curation.curate(hubDocs, "doc_id", "text",
      minQuality = 0.0, nearDupThreshold = 0.4, transitive = true,
      lshBands = 32)
    val transIds = trans.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    trans.unpersist(blocking = true)
    assert(transIds === Set(1L),
      "transitive mode keeps exactly the min id of the {1,2,3} component")
  }

  test("transitive curation leaks no cached RDDs") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Curation.curate(hubDocs, "doc_id", "text",
      minQuality = 0.0, nearDupThreshold = 0.4, transitive = true,
      lshBands = 32)
    out.collect()
    out.unpersist(blocking = true)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cache entries: $leaked")
  }
}
