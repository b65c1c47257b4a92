package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fixed-point PageRank over an undirected pair table — the centrality
 * ranking of the near-dup graph (which documents sit at the center of a
 * duplication cluster vs. its fringe).
 *
 * All arithmetic is integral so the result hash-gates: ranks are scaled
 * by 10¹², the damping factor d = 0.85 is applied as `(85 · s) DIV 100`,
 * and each node's out-contribution is `pr DIV outdeg` (floor division —
 * both engines state the identical operation; no IEEE anywhere). This is
 * the standard unnormalized power iteration with a constant teleport
 * term per node.
 *
 * Shape for 100 TB: the edge list + degree table build once and cache;
 * each iteration is one equi-join on the (already co-partitioned) edge
 * key plus one hash aggregate on the destination — the canonical
 * message-passing round, shuffle volume O(edges) per round with map-side
 * combine on the aggregate, never O(nodes²). Iteration count is a
 * constant (k), so the lineage stays bounded.
 */
object PageRank {

  val Scale = 1000000000000L // 10^12 fixed-point rank units
  private val Teleport = 150000000000L // (1 - 0.85) * Scale

  /** k power-iteration rounds over undirected pairs (id_a, id_b).
    * Returns (id, degree, pr) for every node incident to an edge. */
  def fixedPoint(pairs: DataFrame, k: Int): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"),
        col("id_a").as("dst")))
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    // out-contribution denominator rides WITH the edge so the per-round
    // join is a single equi-join against the current ranks
    val withDeg = edges.join(deg, "src")
    CacheScope.withStages(withDeg) {
      var pr = deg.select(col("src").as("id"), lit(Scale).as("pr"))
      for (_ <- 1 to k) {
        pr = withDeg
          .join(pr.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"),
            expr("pr DIV outdeg").as("c"))
          .groupBy(col("id"))
          .agg(sum(col("c")).as("s"))
          .select(col("id"),
            (lit(Teleport) + expr("(85 * s) DIV 100")).as("pr"))
      }
      CacheScope.pin(
        pr.join(deg.select(col("src").as("id"),
            col("outdeg").as("degree")), "id")
          .select(col("id"), col("degree"), col("pr")))
    }
  }
}
