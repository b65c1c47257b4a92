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
 */
object Cluster {

  /**
   * Component assignment for every node appearing in `pairs`:
   * (node, component) where component = the minimum node id reachable
   * through the pair graph (including itself). The result arrives
   * persisted + materialized (CacheScope contract — caller owns the one
   * `unpersist()`); all per-round intermediates are released here.
   */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    val half = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
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
        val viaNeighbor = edges.join(labels, edges("src") === labels("node"))
          .select(edges("dst").as("node"), labels("label"))
        val viaJump = labels.as("l1")
          .join(labels.as("l2"), col("l1.label") === col("l2.node"))
          .select(col("l1.node").as("node"), col("l2.label").as("label"))
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
    } finally edges.unpersist(blocking = false)
  }
}
