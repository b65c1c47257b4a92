package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Reciprocal-Rank Fusion (RRF) of ranked retrieval lists — the standard
 * way hybrid search merges a lexical (BM25) and a semantic (dense-vector)
 * ranking without score calibration (Cormack, Clarke & Buettcher,
 * SIGIR'09): fused(d) = Σ_lists 1/(k + rank_list(d)), k typically 60.
 * Ranks are integers, so the fused score is a short fixed sequence of
 * IEEE divisions and adds — cross-engine deterministic, unlike fusing raw
 * float scores whose scales differ per retriever.
 *
 * 100 TB shape: fusion NEVER touches the corpus — each retriever already
 * reduced it to a top-N list (TakeOrderedAndProject: N winners move, q90's
 * BM25 and q28's cosine both end that way), so ranking and fusing operate
 * on two ≤N-row inputs. The single-partition rank windows and the
 * full-outer join are all bounded by N, not by data size; the expensive
 * parts (the retrievers) scale independently and are gated on their own.
 */
object Fusion {

  /** 1-based rank (1 = best) by `scoreCol` DESC with ties pinned by
    * `idCol` ASC, over a list already bounded to top-N rows. The
    * single-partition window is safe precisely because the input is a
    * bounded list, never a corpus. */
  def rankByScore(list: DataFrame, idCol: String, scoreCol: String): DataFrame =
    list.withColumn("rank",
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))).cast("long"))

  /**
   * Fuse two ranked lists (each carrying `idCol` + a `rank` column) into
   * RRF scores. Docs absent from a list contribute 0.0 for it and report
   * rank 0 (an integer sentinel rather than NULL: nullable int columns
   * round-trip as float64 through pandas bridges and would poison the
   * exact hash gate). The two reciprocals are added a-list-first — with
   * two terms IEEE addition is order-insensitive, but stating it keeps
   * the oracle literal.
   */
  def rrfFuse(listA: DataFrame, listB: DataFrame, idCol: String,
              k: Int, topN: Int): DataFrame = {
    val a = listA.select(col(idCol), col("rank").as("rank_a"))
    val b = listB.select(col(idCol), col("rank").as("rank_b"))
    def contrib(r: org.apache.spark.sql.Column) =
      when(r.isNotNull, lit(1.0) / (lit(k.toDouble) + r.cast("double")))
        .otherwise(lit(0.0))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        coalesce(col("rank_a"), lit(0L)).as("rank_a"),
        coalesce(col("rank_b"), lit(0L)).as("rank_b"),
        (contrib(col("rank_a")) + contrib(col("rank_b"))).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topN)
  }
}
