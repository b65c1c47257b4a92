package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.ops.{BloomJoin, Frequency, InvertedIndex}

/**
 * Round-5 widening: shuffle-reduction and index-construction operators —
 * bloom semi-join pruning, sketch-verified heavy hitters, inverted-index
 * build. Each oracle-gated (DuckDB twin over the same parquet); the
 * sketches only PROPOSE, exact passes own every emitted row, so the gates
 * hold across engines.
 */
object ScaleQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q81 — bloom-pruned join ([[BloomJoin.prunedJoin]]): lineitem probed
    * against the low-nation supplier digest BEFORE the join shuffle; false
    * positives die in the join, so the result is hash-identical to the
    * undecorated join (the oracle IS that undecorated join — the gate
    * proves the reduction is semantically free). */
  def q81BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val supp = Tables.supplier(spark, dir).filter(col("s_nationkey") < 5)
    BloomJoin.prunedJoin(li, supp, "l_suppkey", "s_suppkey",
        expectedItems = 20000L, fpp = 0.01)
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(
        sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_suppkey"))
  }

  val q81Sql: String =
    """SELECT s_suppkey, s_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |WHERE s_nationkey < 5
      |GROUP BY s_suppkey, s_name
      |ORDER BY s_suppkey""".stripMargin

  /** Shared q82/q83 tokenizer: lowercased alpha runs. */
  private def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          t => length(t) > 0)).as("term"))

  /** q82 — heavy-hitter terms ([[Frequency.heavyHitters]]): KSP sketch
    * proposes ≤ 1/support candidates in one bounded-state pass, an exact
    * count pass verifies — output is exact, so the oracle is a sketch-free
    * GROUP BY + HAVING over the same tokens. */
  def q82HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Frequency.heavyHitters(tokens(spark, dir), "term", support = 0.002)
      .orderBy(col("cnt").desc, col("term"))

  val q82Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'),
      |    x -> length(x) > 0)) AS term
      |  FROM documents),
      |n AS (SELECT count(*) AS total FROM tok)
      |SELECT term, count(*) AS cnt
      |FROM tok CROSS JOIN n
      |GROUP BY term, n.total
      |HAVING CAST(count(*) AS DOUBLE) > 0.002 * CAST(n.total AS DOUBLE)
      |ORDER BY cnt DESC, term""".stripMargin

  /** q83 — inverted-index build ([[InvertedIndex.build]]): term admission
    * len ≥ 6 / df ≥ 2, postings bounded to the first 3 per term in
    * (doc_id, pos) order (the WindowGroupLimit-friendly rank filter). */
  def q83InvertedIndex(spark: SparkSession, dir: String): DataFrame =
    InvertedIndex.build(Tables.documents(spark, dir), "doc_id", "text",
        minTermLen = 6, minDocs = 2, postingsK = 3)
      .orderBy(col("term"), col("post_rank"))

  val q83Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
      |      x -> length(x) > 0) AS toks
      |  FROM documents),
      |post AS (
      |  SELECT doc_id, toks[p] AS term, CAST(p AS INTEGER) AS pos
      |  FROM t, UNNEST(generate_series(1, len(toks))) AS u(p)
      |  WHERE length(toks[p]) >= 6),
      |stats AS (
      |  SELECT term, count(DISTINCT doc_id) AS n_docs, count(*) AS tf_total
      |  FROM post GROUP BY term HAVING count(DISTINCT doc_id) >= 2),
      |ranked AS (
      |  SELECT term, doc_id, pos,
      |    CAST(row_number() OVER (PARTITION BY term ORDER BY doc_id, pos)
      |      AS INTEGER) AS post_rank
      |  FROM post)
      |SELECT r.term, s.n_docs, s.tf_total, r.post_rank, r.doc_id, r.pos
      |FROM ranked r JOIN stats s USING (term)
      |WHERE r.post_rank <= 3
      |ORDER BY r.term, r.post_rank""".stripMargin
}
