package graft

import org.apache.spark.sql.functions.{broadcast, col, lit, when}

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

  test("star graph (1 hub, 1e5 leaves): hot tiers engage, result unchanged") {
    // hub 0 ~ every leaf: the hub's degree AND (after one round) the
    // count of label-0 holders both blow past the threshold, so both the
    // neighbor join and the jump join must route the hot key through the
    // broadcast tier instead of one reducer
    val n = 100000L
    val star = (1L to n).map(i => (0L, i)).toDF("id_a", "id_b")
    val cc = Cluster.connectedComponents(star, "id_a", "id_b",
      hotThreshold = 1000L)
    val rows = cc.collect()
    cc.unpersist(blocking = true)
    assert(rows.length === (n + 1) && rows.forall(_.getLong(1) === 0L))
  }

  test("hot tiers are broadcast joins and equal the unsplit joins exactly") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def bhjCount(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // finalize any adaptive plan first
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Int =
        (p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan) // AQE stages are leaves
          case b: BroadcastHashJoinExec => 1 + b.children.map(walk).sum
          case other => other.children.map(walk).sum
        }) + p.subqueries.map(walk).sum
      walk(df.queryExecution.executedPlan)
    }
    // directed-both-ways edge list of a small star + a normal pair
    val pairs = ((1L to 50L).map(i => (0L, i)) :+ (100L, 101L))
      .toDF("id_a", "id_b")
    val half = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = half.unionByName(
      half.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node") + 1000) // non-trivial labels

    val threshold = 10L
    val hot = Cluster.hotNodes(edges, threshold)
    assert(hot.collect().map(_.getLong(0)).toSeq === Seq(0L),
      "only the hub exceeds the degree threshold")
    val edgesNorm = edges.join(broadcast(hot),
      edges("src") === col("hot_src"), "left_anti")
    val edgesHot = edges.join(broadcast(hot), edges("src") === col("hot_src"))
      .select(col("src"), col("dst"))

    // equivalence: two-tier candidates == the plain unsplit join
    val twoTier = Cluster.neighborCandidates(
      edgesNorm, Some(edgesHot), hot, labels)
    val plain = edges.join(labels, edges("src") === labels("node"))
      .select(edges("dst").as("node"), labels("label"))
    assert(twoTier.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      === plain.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // ... and the hot tier really is broadcast (2 BHJs: label lookup + fan-out)
    assert(bhjCount(twoTier) >= 2,
      "hot neighbor tier must join via broadcast, not a hot shuffle key")

    // jump tier: make label 0 hot (51 holders > threshold)
    val converged = labels.withColumn("label",
      when(col("node") <= 50L, lit(0L)).otherwise(col("node")))
    val jump = Cluster.jumpCandidates(converged, threshold)
    val jumpPlain = converged.as("l1")
      .join(converged.as("l2"), col("l1.label") === col("l2.node"))
      .select(col("l1.node").as("node"), col("l2.label").as("label"))
    assert(jump.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      === jumpPlain.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    assert(bhjCount(jump) >= 2,
      "hot jump tier must join via broadcast, not a hot shuffle key")
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
