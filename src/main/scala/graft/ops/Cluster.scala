package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/**
 * Connected components over an undirected pair list — the closure step
 * production dedup needs on top of verified near-dup PAIRS: "keep one doc
 * per duplicate CLUSTER" is a statement about components, not pairs (for a
 * chain A~B~C with A≁C, pair-local "drop the higher id of each pair" keeps
 * a doc or two depending on which ids happened to be adjacent; the
 * component view always keeps exactly the minimum).
 *
 * Algorithm: iterative min-label propagation, pure DataFrame ops — each
 * round every node takes the min label among {itself} ∪ {neighbors'
 * labels} ∪ {its label's label} (the last is pointer-jumping, which
 * collapses chains in O(log diameter) rounds instead of O(diameter)).
 * Each round is hash joins + one groupBy — no driver loop over ROWS; the
 * driver only iterates ROUNDS, checking a one-row convergence aggregate.
 *
 * Scale shape: edges and the current label frame are persisted; per round
 * work is two shuffle joins + one aggregation over |V|+|E| rows. Labels
 * only ever decrease, so sum(label) strictly decreases until the fixpoint
 * — the convergence test is one scalar per round, not a frame compare.
 * Round count is bounded by log₂(longest chain); near-dup clusters are
 * shallow (most are pairs/triangles), so 2-3 rounds in practice.
 *
 * Skew: real near-dup graphs have HUBS (a boilerplate page similar to
 * millions of others) and, once propagation spreads, GIANT components
 * whose shared label key concentrates a whole component on one reducer.
 * Both joins are therefore two-tier above `hotThreshold`:
 *
 *  - neighbor join — nodes whose degree exceeds the threshold are split
 *    out ONCE (degrees are static); their label rows (≤ |E|/threshold of
 *    them, bounded by construction) are broadcast against the hot edges,
 *    so a hub's edge fan-out is map-side and spread over every partition
 *    that holds its edges, instead of one reducer receiving degree(hub)
 *    rows;
 *  - jump join — labels held by more than `hotThreshold` nodes are
 *    detected each round (a map-side-combining count whose output is
 *    again ≤ |V|/threshold rows); the root rows of those labels are
 *    broadcast against the hot members, the rest shuffles normally with
 *    a per-key bound of `hotThreshold`.
 *
 * Both tiers are exact rewrites of the same join (SkewSpec-style
 * equivalence is asserted in ClusterSpec on a star graph), so the result
 * is independent of the threshold; only the exchange topology changes.
 */
object Cluster {

  /** Per-reducer row bound before a key is promoted to the broadcast
    * tier. At 2²⁰ a straggler task handles ≤ ~1M joined rows; the
    * broadcast sides are bounded by |E|/2²⁰ resp. |V|/2²⁰ rows. */
  val DefaultHotThreshold: Long = 1L << 20

  /** Hot-degree nodes: (src) with degree > threshold. Small by
    * construction: at most |E|/threshold rows. */
  private[graft] def hotNodes(edges: DataFrame, threshold: Long): DataFrame =
    edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") > threshold)
      .select(col("src").as("hot_src"))

  /** One round's neighbor-label candidates with the hot tier broadcast:
    * normal edges shuffle-join labels (per-key ≤ threshold rows); hot
    * edges get their few label rows broadcast (map-side, no hot reducer). */
  private[graft] def neighborCandidates(edgesNorm: DataFrame,
                                        edgesHot: Option[DataFrame],
                                        hot: DataFrame,
                                        labels: DataFrame): DataFrame = {
    val viaNorm = edgesNorm.join(labels, edgesNorm("src") === labels("node"))
      .select(edgesNorm("dst").as("node"), labels("label"))
    edgesHot match {
      case None => viaNorm
      case Some(he) =>
        val hotLabels = labels
          .join(broadcast(hot), labels("node") === col("hot_src"))
          .select(labels("node").as("hnode"), labels("label").as("hlabel"))
        val viaHot = he.join(broadcast(hotLabels), he("src") === col("hnode"))
          .select(he("dst").as("node"), col("hlabel").as("label"))
        viaNorm.unionByName(viaHot)
    }
  }

  /** One round's pointer-jump candidates with the hot tier broadcast:
    * labels shared by > threshold nodes jump via a broadcast of their
    * (tiny) root rows; everything else shuffles with a bounded key. */
  private[graft] def jumpCandidates(labels: DataFrame,
                                    threshold: Long): DataFrame = {
    val hotLabels = labels.groupBy(col("label")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > threshold)
      .select(col("label").as("hl"))
    if (hotLabels.isEmpty) {
      labels.as("l1")
        .join(labels.as("l2"), col("l1.label") === col("l2.node"))
        .select(col("l1.node").as("node"), col("l2.label").as("label"))
    } else {
      val l1Hot = labels.join(broadcast(hotLabels),
          labels("label") === col("hl"))
        .select(labels("node"), labels("label"))
      val l1Norm = labels.join(broadcast(hotLabels),
        labels("label") === col("hl"), "left_anti")
      // the root ROW of each hot label (labels has one row per node and
      // label values are node ids, so it always exists) — tiny: one row
      // per hot label
      val roots = labels.join(broadcast(hotLabels),
          labels("node") === col("hl"))
        .select(labels("node").as("rnode"), labels("label").as("rlabel"))
      val jumpHot = l1Hot.join(broadcast(roots), col("label") === col("rnode"))
        .select(col("node"), col("rlabel").as("label"))
      val jumpNorm = l1Norm.as("l1")
        .join(labels.as("l2"), col("l1.label") === col("l2.node"))
        .select(col("l1.node").as("node"), col("l2.label").as("label"))
      jumpNorm.unionByName(jumpHot)
    }
  }

  /**
   * Component assignment for every node appearing in `pairs`:
   * (node, component) where component = the minimum node id reachable
   * through the pair graph (including itself). The result arrives
   * persisted + materialized (CacheScope contract — caller owns the one
   * `unpersist()`); all per-round intermediates are released here.
   */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 50,
                          hotThreshold: Long = DefaultHotThreshold): DataFrame = {
    val spark = pairs.sparkSession
    val half = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // degree split is static — computed once, both halves persisted; the
    // hot frame is at most |E|/threshold rows (usually empty, usually a
    // handful of boilerplate hubs)
    val hot = hotNodes(edges, hotThreshold)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hasHot = !hot.isEmpty
    val edgesNorm =
      if (!hasHot) edges
      else edges.join(broadcast(hot), edges("src") === col("hot_src"),
          "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    val edgesHot =
      if (!hasHot) None
      else Some(edges.join(broadcast(hot), edges("src") === col("hot_src"))
        .select(col("src"), col("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    try {
      // Lineage truncation: Catalyst plan TREES duplicate shared subtrees,
      // so an iterative plan referencing the previous round 3× (itself,
      // the neighbor join, both jump sides) grows ~4^round and OOMs the
      // driver before the data is ever big. Round-tripping each round
      // through its RDD pins a constant-size LogicalRDD plan; the RDD DAG
      // underneath grows linearly and reads the persisted previous round.
      def materialize(df: DataFrame): DataFrame = {
        val out = spark.createDataFrame(df.rdd, df.schema)
        out.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()
        out
      }
      var labels = materialize(edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")))
      // sum(label) is monotonically decreasing (labels only shrink), so
      // equality across rounds IS the fixpoint; decimal(38,0) cannot
      // overflow at any realistic node count (empty graph sums to null →
      // ZERO → fixpoint on the first round)
      def labelSum(l: DataFrame): java.math.BigDecimal = {
        val d = l.agg(sum(col("label").cast(DecimalType(38, 0)))).head.getDecimal(0)
        if (d == null) java.math.BigDecimal.ZERO else d
      }
      var prevSum = labelSum(labels)
      var round = 0
      var converged = false
      while (!converged && round < maxRounds) {
        val viaNeighbor = neighborCandidates(edgesNorm, edgesHot, hot, labels)
        val viaJump = jumpCandidates(labels, hotThreshold)
        val next = materialize(
          labels.unionByName(viaNeighbor).unionByName(viaJump)
            .groupBy(col("node")).agg(min(col("label")).as("label")))
        val nextSum = labelSum(next)
        labels.unpersist(blocking = false)
        labels = next
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        round += 1
      }
      require(converged, s"label propagation did not converge in $maxRounds rounds")
      // re-pin under the OUTPUT schema: the caller's unpersist() must
      // release the exact plan it was handed, not a projection of an
      // internal cache entry
      try CacheScope.pin(labels.select(col("node"), col("label").as("component")))
      finally labels.unpersist(blocking = false)
    } finally {
      edges.unpersist(blocking = false)
      hot.unpersist(blocking = false)
      if (hasHot) {
        edgesNorm.unpersist(blocking = false)
        edgesHot.foreach(_.unpersist(blocking = false))
      }
    }
  }

  /**
   * Two-hop reach census over an undirected pair list: per node, the
   * exact count of distinct neighbors (`n1`) and of distinct nodes at
   * graph distance EXACTLY 2 (`n2` — neighbors-of-neighbors minus self
   * minus direct neighbors). The cheap integer-exact local-centrality
   * signal ("how embedded is this doc in its near-dup neighborhood")
   * where iterative float centralities couldn't be hash-gated.
   *
   * Cost is Σ_v deg(v)² candidate rows into the distinct — the standard
   * two-path bound. Near-dup graphs keep degrees small by construction
   * (they're built from banded/verified pairs, not all-pairs); a hub
   * that breaks that assumption is the same hub [[connectedComponents]]
   * promotes to its broadcast tier, and capping it belongs in the pair
   * engine (frequency caps, as SpanDedup does), not here.
   */
  def twoHopCensus(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
    CacheScope.withStages(e) {
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("n1"))
      val twoPaths = e.select(col("src"), col("dst").as("mid"))
        .join(e.select(col("src").as("mid"), col("dst").as("far")), "mid")
        .filter(col("src") =!= col("far"))
        .select(col("src"), col("far"))
        .distinct()
      val exactlyTwo = twoPaths
        .join(e.select(col("src"), col("dst").as("far")), Seq("src", "far"),
          "left_anti")
        .groupBy(col("src")).agg(count(lit(1)).as("n2"))
      CacheScope.pin(deg.join(exactlyTwo, Seq("src"), "left_outer")
        .select(col("src").as("node"), col("n1"),
          coalesce(col("n2"), lit(0L)).as("n2")))
    }
  }
}
