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
    // each LEVEL persists before the next is planned (manual stage list —
    // the loop's frontiers aren't known up front for
    // CacheScope.withStages): level h is referenced by round h+1's
    // expansion, every later round's anti-join and the final union, so
    // without a per-level pin the reference DAG re-evaluates prior levels
    // multiplicatively. Only the LEAVES (edges, each level) persist; the
    // settled union is never cached — re-assembling it per reference is a
    // read of cached leaf blocks, strictly cheaper than writing one more
    // cache copy of the whole settled set every round (the r13 shape paid
    // a settled persist + count job per round).
    val staged = scala.collection.mutable.Buffer[DataFrame](edges)
    edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val level0 = seeds.select(col("id")).distinct()
        .withColumn("dist", lit(0L))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      staged += level0
      var dist: DataFrame = level0
      var frontier = level0.select(col("id"))
      // one count job per round — it materializes the new level's cache
      // (edges materialize inside round 1's job) AND is the fixpoint
      // test: BFS settles every reachable node by the time a frontier
      // comes back empty, so later rounds are provably empty joins —
      // stop instead of scheduling them (maxHops is the CAP, the data's
      // actual radius decides the round count).
      var frontierN = level0.count()
      var h = 1
      while (h <= maxHops && frontierN > 0) {
        val next = edges
          .join(frontier.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"))
          .distinct()
          .join(dist.select(col("id")), Seq("id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        staged += next
        frontierN = next.count()
        if (frontierN > 0) {
          dist = dist.unionByName(next.withColumn("dist", lit(h.toLong)))
          frontier = next
        }
        h += 1
      }
      CacheScope.pin(dist.select(col("id"), col("dist")))
    } finally staged.foreach(_.unpersist(blocking = false))
  }
}
