package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-source breadth-first search over an undirected pair table: the
 * minimum hop distance (capped at `maxHops`) from ANY seed node — the
 * "blast radius" primitive behind contamination spread ("every document
 * within k near-dup hops of a flagged one"), recall expansion and
 * provenance reach, and the relational twin of a recursive CTE
 * (`WITH RECURSIVE walk AS (seeds UNION step)` — the oracle states
 * exactly that).
 *
 * Frontier algorithm, level-synchronous: round h joins the current
 * frontier against the edge list, dedups the successors, and anti-joins
 * the already-settled set (BFS settles a node the first time it is
 * reached, which IS its minimum hop count — no re-relaxation, unlike
 * weighted shortest paths). Every round is one equi-join on the edge key
 * + one hash-aggregate dedup + one anti-join: shuffle volume O(edges)
 * per round with no node-pair blowup, the canonical message-passing
 * shape ([[PageRank]] discipline). The driver loop is bounded by the
 * CONFIG constant `maxHops`, never by data, so lineage depth stays
 * bounded; shrinking frontiers broadcast under AQE automatically.
 */
object Bfs {

  /**
   * (id, dist) for every node whose minimum hop distance from the seed
   * set is ≤ maxHops; seeds themselves carry dist 0. `pairs` is the
   * undirected (id_a, id_b) edge table, `seeds` a single-column `id`
   * frame (dedup'd here; isolated seeds still surface at dist 0).
   */
  def hopDistances(pairs: DataFrame, seeds: DataFrame, maxHops: Int)
      : DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"),
        col("id_a").as("dst")))
    // each level MATERIALIZES before the next is planned (manual stage
    // list — the loop's frontiers aren't known up front for
    // CacheScope.withStages): frontier h is referenced by both round
    // h+1's expansion and the settled union, so without a per-level
    // pin the reference DAG re-evaluates prior levels multiplicatively
    // (bounded by 2^maxHops, but a true level-synchronous BFS computes
    // every level exactly once)
    val staged = scala.collection.mutable.Buffer[DataFrame](edges)
    edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      edges.count()
      var dist = seeds.select(col("id")).distinct()
        .withColumn("dist", lit(0L))
      var frontier = dist.select(col("id"))
      for (h <- 1 to maxHops) {
        val next = edges
          .join(frontier.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"))
          .distinct()
          .join(dist.select(col("id")), Seq("id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        staged += next
        // settled set stages too: round h+1's anti-join and the final
        // union both read it (same multiplicative-reference argument)
        val settled = dist
          .unionByName(next.withColumn("dist", lit(h.toLong)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        settled.count()
        staged += settled
        frontier = next
        dist = settled
      }
      CacheScope.pin(dist.select(col("id"), col("dist")))
    } finally staged.foreach(_.unpersist(blocking = false))
  }
}
