package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Maximal Marginal Relevance (MMR) selection — the diversity-aware top-k
 * used to build evaluation/demo slices from an embedded corpus: greedily
 * pick the candidate maximizing `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`,
 * i.e. relevance penalized by similarity to what is already selected
 * (Carbonell & Goldstein, SIGIR'98).
 *
 * CONTRACT: this is MMR over the top-candN-BY-RELEVANCE candidate pool,
 * not over the whole corpus — the standard practical restriction
 * (rerank-the-retrieved). The prune is NOT admissible in general: a
 * document just outside the pool with low similarity to the selected set
 * can have a higher true MMR score than every penalized pool member, and
 * with negative similarities a score can even exceed λ·rel. Callers pick
 * candN as the retrieval depth they would rerank anyway (candN ≫ k makes
 * the corner rare); the q127 oracle states the SAME pool, so the gate
 * proves pool-restricted MMR exactly.
 *
 * 100 TB shape: the greedy loop is inherently sequential, but its input
 * is the pool, never the corpus — one DISTRIBUTED exact top-candN pass
 * (TakeOrderedAndProject — only candN winners move), then k argmax
 * rounds over the tiny cached candidate set, each a one-row job — the
 * [[Frequency]] convention of collecting only provably-bounded results.
 * Selected vectors re-enter each round as broadcast literals.
 *
 * All scoring is fixed-order double arithmetic over the same fused cosine
 * the q28 gate proved bit-identical to the SQL fold — ties broken by id.
 */
object Mmr {

  /**
   * Greedy MMR top-k against the query vector of row `queryId`: returns
   * (rank, id, rel, mmr_score) for the winners, in pick order. `candN`
   * bounds the relevance-pruned candidate pool; if the pool (or the
   * corpus) holds fewer than k candidates, the result is the exhausted
   * pool in pick order (fewer than k rows), not an error.
   *
   * `lambda` and `penaltyWeight` are BOTH stated explicitly rather than
   * deriving one from the other: `1.0 - 0.7` is 0.30000000000000004 in
   * binary64 while a cross-engine SQL literal `0.3` is not — the derived
   * weight would diverge from any oracle's stated constant by 1 ulp and
   * break exact score parity.
   */
  def mmrTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, lambda: Double, penaltyWeight: Double,
              candN: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._

    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"))
    val cands = emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol).as("id"),
        transform(col(vecCol), v => v.cast(DoubleType)).as("e"),
        Similarity.cosine(col(vecCol), col("qv")).as("rel"))
      .orderBy(col("rel").desc, col("id"))
      .limit(candN)
      .cache()
    try {
      var picked = Vector.empty[(Int, Long, Double, Double)]
      var pickedVecs = Vector.empty[Seq[Double]]
      var exhausted = false
      for (step <- 1 to k if !exhausted) {
        val sims = pickedVecs.map(s =>
          Similarity.cosine(col("e"), array(s.map(lit): _*)))
        val penalty = sims match {
          case Seq()  => lit(0.0)
          case Seq(s) => s // Spark's greatest requires >= 2 args
          case many   => greatest(many: _*)
        }
        val rows = cands
          .filter(!col("id").isInCollection(picked.map(_._2) match {
            case e if e.isEmpty => Seq(-1L); case ids => ids
          }))
          .select(col("id"), col("e"), col("rel"),
            (lit(lambda) * col("rel") - lit(penaltyWeight) * penalty)
              .as("score"))
          .orderBy(col("score").desc, col("id"))
          .limit(1)
          .collect()
        if (rows.isEmpty) exhausted = true
        else {
          val row = rows(0)
          picked :+= ((step, row.getLong(0), row.getDouble(2),
            row.getDouble(3)))
          pickedVecs :+= row.getSeq[Double](1)
        }
      }
      picked.toDF("rank", "id", "rel", "mmr_score")
    } finally cands.unpersist(blocking = false)
  }
}
