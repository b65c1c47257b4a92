package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed triangle counting over an undirected edge list — the
 * clustering-coefficient numerator of the near-dup graph, and the classic
 * "is this duplicate cluster a clique or a chain?" diagnostic a dedup
 * rollout reads next to the degree census (q92).
 *
 * Algorithm: the degree-ordered node-iterator (Schank & Wagner 2005,
 * "Finding, Counting and Listing All Triangles in Large Graphs"). Every
 * edge is oriented from its lower-(degree, id) endpoint to its
 * higher-(degree, id) endpoint; wedges are enumerated by self-joining the
 * oriented list on the source; a wedge (x→y, x→z) closes iff the
 * undirected edge {y, z} exists. Orienting by DEGREE (id as tie-break)
 * bounds the wedge count by Σ min(deg)² ≈ O(m^1.5) instead of the Σ deg²
 * of naive orientation — on a power-law near-dup graph (a few viral
 * templates duplicated everywhere) the hub vertex contributes its degree
 * squared under id-orientation but almost nothing under degree-orientation,
 * which is exactly the skew story at 100 TB. Each triangle has exactly ONE
 * minimum-rank vertex, so it is emitted exactly once, no /3 correction.
 *
 * Everything shuffles only (long, long) edge keys: two hash joins to
 * attach endpoint degrees, one self-join on the wedge center, one
 * semi-join against the canonical edge set, one explode + count. No
 * adjacency lists are materialized per node (no groupBy collect_list), so
 * no single task owns a hub's full neighborhood.
 */
object Triangles {

  /**
   * Per-vertex triangle participation over `edges` (columns `id_a` <
   * `id_b`, one row per undirected edge, no self-loops). Returns
   * (`id`, `n_triangles`) for every vertex in at least one triangle.
   */
  def participation(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id_a").cast("long"), col("id_b").cast("long"))
    triangleRows(e)
      .select(explode(array(col("src"), col("id_a"), col("id_b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** One row per triangle (src = its minimum-rank vertex, id_a < id_b the
    * closing edge) via the degree-ordered wedge join. */
  private def triangleRows(e: DataFrame): DataFrame = {
    // Vertex degrees (each edge contributes to both endpoints).
    val deg = e.select(col("id_a").as("id"))
      .unionByName(e.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))

    // Orient by (deg, id): src = lower rank, dst = higher rank.
    val oriented = e
      .join(deg.withColumnRenamed("id", "id_a").withColumnRenamed("deg", "deg_a"), "id_a")
      .join(deg.withColumnRenamed("id", "id_b").withColumnRenamed("deg", "deg_b"), "id_b")
      .select(
        when(col("deg_a") < col("deg_b") ||
             (col("deg_a") === col("deg_b") && col("id_a") < col("id_b")),
          col("id_a")).otherwise(col("id_b")).as("src"),
        when(col("deg_a") < col("deg_b") ||
             (col("deg_a") === col("deg_b") && col("id_a") < col("id_b")),
          col("id_b")).otherwise(col("id_a")).as("dst"))

    // Wedges around each center: unordered out-neighbor pairs, canonical
    // (least, greatest) by id so the closing lookup hits the undirected set.
    val l = oriented.select(col("src"), col("dst").as("y"))
    val r = oriented.select(col("src"), col("dst").as("z"))
    val wedges = l.join(r, "src")
      .filter(col("y") < col("z"))
      .select(col("src"), col("y").as("id_a"), col("z").as("id_b"))

    // A wedge closes iff {y, z} is an edge; join against the canonical list.
    wedges.join(e, Seq("id_a", "id_b"))
  }

  /**
   * Global transitivity summary — ONE row: total triangles, total wedges
   * (Σ deg·(deg−1)/2), and the transitivity ratio 3T/W as an exact
   * integer fraction (`trans_num`, `trans_den`). The whole-graph
   * "how clique-like is the duplication structure" scalar, distinct from
   * the per-node censuses (q155's counts, q179's coefficients).
   */
  def transitivity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id_a").cast("long"), col("id_b").cast("long"))
    val tri = triangleRows(e).agg(count(lit(1)).as("n_triangles"))
    val wedges = e.select(col("id_a").as("id"))
      .unionByName(e.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      // deg·(deg−1) summed as LONG, halved by integral div — no doubles
      .agg(sum(col("deg") * (col("deg") - 1)).as("tw"))
      .select(expr("tw div 2").as("n_wedges"))
    tri.crossJoin(broadcast(wedges)) // two 1-row aggregates
      .select(col("n_triangles"), col("n_wedges"),
        (col("n_triangles") * 3).as("trans_num"),
        col("n_wedges").as("trans_den"))
  }

  /**
   * Local clustering coefficient as an EXACT pair: per vertex of degree
   * ≥ 2, its degree, closed-triangle count, and wedge count
   * deg·(deg−1)/2 — the coefficient is `n_triangles / n_wedges`, carried
   * as integers so the contract has no IEEE division (the q176
   * convention). Vertices in no triangle report 0, not absence.
   */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id_a").cast("long"), col("id_b").cast("long"))
    val deg = e.select(col("id_a").as("id"))
      .unionByName(e.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    deg.filter(col("degree") >= 2)
      .join(participation(e), Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("degree * (degree - 1) div 2").as("n_wedges"))
  }
}
