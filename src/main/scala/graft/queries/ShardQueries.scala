package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.ops.{Packing, TextAnalysis}

/**
 * q118-q121 — the training-shard preparation tier: the operations that sit
 * BETWEEN a curated corpus and a training run (pack into token-budget
 * shards, scrub a deny-list, hit a source-mix plan, quantize embeddings).
 * Reference scope: these extend the LLM-pipeline surface the builder brief
 * names; the trends reference itself (trends.go) has no equivalent tier.
 */
object ShardQueries {

  /** q118 — token-budget shard packing ([[graft.ops.Packing]]): documents
    * in doc_id order are packed into 8192-token shards by the streaming
    * rule `shard = floor(running_start / budget)`; reported per shard.
    * The engine's two-phase prefix sum (range partition → driver offsets
    * → partitioned window) must equal the oracle's naive single-reducer
    * global window EXACTLY — the gate is the distributed-cumsum proof. */
  def q118ShardPacking(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextAnalysis.words(col("text"))).as("n_tok"))
    val packed = Packing.packByBudget(docs, col("n_tok"), budget = 8192L,
      col("doc_id"))
    packed.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("shard_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard_id"))
  }

  val q118Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n_tok,
      |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS running_start
      |  FROM d)
      |SELECT CAST(running_start // 8192 AS BIGINT) AS shard_id,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM s
      |GROUP BY 1
      |ORDER BY shard_id""".stripMargin

  /** q119 — deny-list scrubbing with audit stats: redact a term deny-list
    * (word-boundary regex — the PII/unsafe-vocabulary scrub shape) and
    * report, per source, how many documents and occurrences were touched
    * plus an order-independent 48-bit-md5 checksum of the CLEANED texts —
    * the "prove the scrub ran, byte-exactly, without sorting the corpus"
    * audit artifact ([[graft.ops.Checksum]]'s convention). Map-only until
    * one hash aggregate. */
  def q119DenyListScrub(spark: SparkSession, dir: String): DataFrame = {
    val pattern = "\\b(customer|supplier|account)\\b"
    val scrubbed = Tables.documents(spark, dir)
      .select(col("source"),
        regexp_count(col("text"), lit(pattern)).as("n_hits"),
        regexp_replace(col("text"), pattern, "[REDACTED]").as("cleaned"))
    scrubbed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_docs_hit"),
        sum(col("n_hits")).cast("long").as("n_redactions"),
        sum(conv(substring(md5(col("cleaned")), 1, 12), 16, 10)
          .cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).cast("string")
          .as("cleaned_checksum"))
      .orderBy(col("source"))
  }

  val q119Sql: String =
    """WITH s AS (
      |  SELECT source,
      |    len(regexp_extract_all(text,
      |      '\b(customer|supplier|account)\b')) AS n_hits,
      |    regexp_replace(text, '\b(customer|supplier|account)\b',
      |      '[REDACTED]', 'g') AS cleaned
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_docs_hit,
      |  CAST(sum(n_hits) AS BIGINT) AS n_redactions,
      |  CAST(CAST(sum(CAST(CAST(concat('0x', substr(md5(cleaned), 1, 12))
      |    AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR)
      |    AS cleaned_checksum
      |FROM s
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** q120 — deterministic source-mix sampling: every source gets a target
    * keep-percentage from the mix plan (here 10 + 4·source_index, a
    * literal plan), and a document survives iff its ENGINE-PORTABLE
    * 48-bit-md5 hash mod 100 falls under the target — the reproducible,
    * seedless, infinitely-rerunnable way to hit a dataset mixing ratio
    * (rand() would differ per engine, partition layout and retry).
    * Map-only + one hash aggregate. */
  def q120MixSampling(spark: SparkSession, dir: String): DataFrame = {
    val pct = (lit(10) +
      regexp_replace(col("source"), "src", "").cast("int") * 4).as("pct")
    val hmod = (conv(substring(md5(col("doc_id").cast("string")), 1, 12),
      16, 10).cast("long") % 100).as("hmod")
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), pct, hmod)
      .groupBy(col("source"))
      .agg(max(col("pct")).as("target_pct"),
        count(lit(1)).as("n_total"),
        sum(when(col("hmod") < col("pct"), 1L).otherwise(0L)).cast("long")
          .as("n_kept"))
      .orderBy(col("source"))
  }

  val q120Sql: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    10 + 4 * CAST(replace(source, 'src', '') AS INT) AS pct,
      |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
      |      AS BIGINT) % 100 AS hmod
      |  FROM documents)
      |SELECT source, max(pct) AS target_pct, count(*) AS n_total,
      |  CAST(sum(CASE WHEN hmod < pct THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept
      |FROM d
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** q121 — int8 embedding quantization audit: per-vector symmetric int8
    * quantization (scale = max|v| / 127, q = floor(v/scale + 0.5) — floor
    * stated on BOTH sides because engines disagree on round-half rules),
    * reporting per label the max reconstruction error and the max scale.
    * Map-only array lambdas into one hash aggregate; max is
    * order-independent so the doubles survive the cross-engine hash gate
    * (the q28/q44 convention — never sum floats across rows). */
  def q121QuantizationAudit(spark: SparkSession, dir: String): DataFrame = {
    val emb = transform(col("embedding"), v => v.cast(DoubleType))
    Tables.embeddings(spark, dir)
      .select(col("label"), emb.as("e"))
      .withColumn("m", array_max(transform(col("e"), v => abs(v))))
      .filter(col("m") > 0)
      .withColumn("scale", col("m") / 127d)
      .withColumn("err", array_max(zip_with(col("e"),
        transform(col("e"), v => floor(v / col("scale") + 0.5d)),
        (v, q) => abs(v - q * col("scale")))))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        max(col("err")).as("max_abs_err"),
        max(col("scale")).as("max_scale"))
      .orderBy(col("label"))
  }

  val q121Sql: String =
    """WITH e AS (
      |  SELECT label,
      |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      |  FROM embeddings),
      |m AS (
      |  SELECT label, e,
      |    list_max(list_transform(e, v -> abs(v))) AS m
      |  FROM e),
      |q AS (
      |  SELECT label, m / 127 AS scale,
      |    list_max(list_transform(e,
      |      v -> abs(v - floor(v / (m / 127) + 0.5) * (m / 127)))) AS err
      |  FROM m WHERE m > 0)
      |SELECT label, count(*) AS n_vecs, max(err) AS max_abs_err,
      |  max(scale) AS max_scale
      |FROM q
      |GROUP BY label
      |ORDER BY label""".stripMargin
}
