package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The hashing trick (Weinberger et al., ICML'09): embed token streams
 * into a FIXED small dimension without a vocabulary — slot j = h(t) mod
 * dim, sign = ±1 from an independent hash bit, vector = Σ_tokens sign·e_j.
 * Unlike learned embeddings this is stateless and exact: every component
 * is an INTEGER sum, so aggregation is order-free and the cross-engine
 * gate hashes component-identical vectors (a float vectorizer could
 * never be gated this way).
 *
 * The hash is the suite's engine-portable one (q120's convention): the
 * first 48 bits of md5, identical in Spark and DuckDB SQL — xxhash64
 * exists only on the Spark side and would un-gate the op.
 *
 * 100 TB shape: explode → one hash aggregate with map-side combine on a
 * key whose cardinality is |groups|·dim (tiny). The per-group vectors
 * land in `dim` integer columns, so downstream cosine is a literal
 * fixed-order expression over broadcast-sized rows.
 */
object FeatureHash {

  /** 48-bit engine-portable token hash (non-negative). */
  def portableHash48(t: Column): Column =
    conv(substring(md5(t), 1, 12), 16, 10).cast("long")

  /**
   * Per-`groupCol` hashed feature vectors over whitespace tokens of
   * `textCol`: one row per group with integer columns `s0..s{dim-1}`
   * (term frequencies fold in naturally — tokens are NOT de-duplicated).
   * Slot = h mod dim; sign = parity of `h div dim` (SQL `div` — EXACT
   * integer division, since `/` on Columns is IEEE division whose floor
   * can misround near integer boundaries for dim > 32).
   */
  def hashedGroupVectors(docs: DataFrame, groupCol: String, textCol: String,
                         dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val tok = docs
      .select(col(groupCol), explode(TextAnalysis.words(col(textCol))).as("t"))
      .withColumn("h", portableHash48(col("t")))
      .select(col(groupCol), pmod(col("h"), lit(dim)).as("j"),
        when(pmod(expr(s"h div $dim"), lit(2)) === 0, 1L).otherwise(-1L)
          .as("s"))
    val slots = (0 until dim).map(j =>
      coalesce(sum(when(col("j") === j, col("s"))), lit(0L)).cast("long")
        .as(s"s$j"))
    tok.groupBy(col(groupCol)).agg(slots.head, slots.tail: _*)
  }

  /**
   * Pairwise cosine between group vectors (`groupCol` pinned a < b):
   * dot and squared norms are EXACT BIGINT sums over the `dim` slots
   * (order-free); the only doubles are the final two sqrt and one
   * division. The self-join runs on |groups| rows — broadcast-sized.
   */
  def cosineMatrix(vecs: DataFrame, groupCol: String, dim: Int): DataFrame = {
    val a = vecs.select(col(groupCol).as("g_a") +:
      (0 until dim).map(j => col(s"s$j").as(s"a$j")): _*)
    val b = vecs.select(col(groupCol).as("g_b") +:
      (0 until dim).map(j => col(s"s$j").as(s"b$j")): _*)
    def dot(x: Int => Column, y: Int => Column): Column =
      (0 until dim).map(j => x(j) * y(j)).reduceLeft(_ + _)
    a.join(broadcast(b), col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"),
        dot(j => col(s"a$j"), j => col(s"b$j")).as("dot"),
        dot(j => col(s"a$j"), j => col(s"a$j")).as("na2"),
        dot(j => col(s"b$j"), j => col(s"b$j")).as("nb2"))
      .select(col("g_a"), col("g_b"),
        (col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))))
          .as("cos_sim"))
  }
}
