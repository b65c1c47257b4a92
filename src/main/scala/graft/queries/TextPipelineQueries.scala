package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Chunking, Cleaning, Sampling, Tfidf}

/**
 * Round-4 text-pipeline extensions: the corpus-preparation operators that
 * sit between raw ingest and training — term scoring, chunking, split
 * assignment, boilerplate detection, PII scrubbing. Each is oracle-gated
 * (DuckDB twin over the same parquet).
 */
object TextPipelineQueries {

  /** q51 — TF-IDF top-5 terms per document ([[Tfidf.topTerms]]). The
    * score is the libm-free tf·N/df form (one exact integer product, one
    * IEEE division) so the hash gate holds across engines; see the op's
    * scaladoc for the shuffle shape. */
  def q51TfidfTopTerms(spark: SparkSession, dir: String): DataFrame =
    Tfidf.topTerms(Tables.documents(spark, dir), "doc_id", "text",
        k = 5, minLen = 4)
      .orderBy(col("doc_id"), col("rank"))

  val q51Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+'))
      |    AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM tok WHERE length(term) >= 4
      |  GROUP BY doc_id, term),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
      |    CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df AS score
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, term) AS BIGINT) AS rank
      |  FROM scored)
      |SELECT doc_id, term, tf, df, score, rank
      |FROM ranked WHERE rank <= 5
      |ORDER BY doc_id, rank""".stripMargin

  /** q52 — document chunking ([[Chunking.chunk]]): 120-char windows,
    * 100-char stride (20-char overlap). Map-only — no shuffle; the md5
    * fingerprint keeps the gate on chunk CONTENT without dragging the
    * full text through the compare. */
  def q52DocChunking(spark: SparkSession, dir: String): DataFrame =
    Chunking.chunk(Tables.documents(spark, dir), "doc_id", "text",
        size = 120, stride = 100)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        col("chunk_len"), md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  val q52Sql: String =
    """WITH starts AS (
      |  SELECT doc_id, text,
      |    unnest(generate_series(1, greatest(length(text), 1), 100))
      |      AS chunk_start
      |  FROM documents)
      |SELECT doc_id,
      |  CAST((chunk_start - 1) // 100 AS BIGINT) AS chunk_idx,
      |  CAST(chunk_start AS BIGINT) AS chunk_start,
      |  CAST(length(substring(text, chunk_start, 120)) AS INTEGER)
      |    AS chunk_len,
      |  md5(substring(text, chunk_start, 120)) AS chunk_md5
      |FROM starts
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** q53 — deterministic train/val/test assignment: the Knuth scramble
    * ([[Sampling.scramble]]) mod 100 buckets every doc into 90/5/5 splits
    * — reproducible in any engine, stable under re-runs and appends
    * (assignment depends only on the id), map-only at any scale. Output
    * is the per-(source, split) manifest with exact char accounting. */
  def q53HashSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(col("doc_id") * lit(2654435761L), lit(1L << 32)) % 100
    Tables.documents(spark, dir)
      .withColumn("split",
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"), col("split"))
  }

  val q53Sql: String =
    """WITH b AS (
      |  SELECT source, n_chars,
      |    (doc_id * 2654435761) % 4294967296 % 100 AS bucket
      |  FROM documents)
      |SELECT source,
      |  CASE WHEN bucket < 90 THEN 'train'
      |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM b
      |GROUP BY 1, 2
      |ORDER BY source, split""".stripMargin

  /** q54 — repeated-phrase (boilerplate) detection: word trigrams present
    * in ≥ 5 distinct documents with their document frequency — the
    * phrase-granularity twin of [[Cleaning.boilerplateLines]] (the corpus
    * has no newlines, so the line dictionary is degenerate here; the specs
    * cover the line path on synthetic multi-line docs). Per-document
    * dedup happens MAP-SIDE (`array_distinct` on the trigram array before
    * explode), so the only shuffle is the phrase count with map-side
    * combine — the previous row-level `.distinct()` shuffled every
    * trigram OCCURRENCE on (doc_id, phrase) first, a second full-width
    * exchange that dominated the 10×-docs wall (SCALING_r6 measured
    * 10.5×). Linear, never pairwise. */
  def q54Boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "[^a-z]+"),
      t => length(t) > 0)
    // Spark's 2-arg sequence(1, stop) DESCENDS for stop < 1 (it infers
    // step -1), unlike DuckDB's empty generate_series — guard short docs
    // to an empty array so explode drops them on both engines
    val tri = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i, lit(3)))))
      .otherwise(array().cast("array<string>"))
    Tables.documents(spark, dir)
      .select(explode(array_distinct(tri)).as("phrase"))
      .groupBy(col("phrase")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 5)
      .orderBy(col("n_docs").desc, col("phrase"))
  }

  val q54Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
      |      x -> length(x) > 0) AS toks
      |  FROM documents),
      |tri AS (
      |  SELECT DISTINCT doc_id,
      |    toks[g] || ' ' || toks[g + 1] || ' ' || toks[g + 2] AS phrase
      |  FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
      |    AS u(g))
      |SELECT phrase, count(*) AS n_docs
      |FROM tri
      |GROUP BY phrase
      |HAVING count(*) >= 5
      |ORDER BY n_docs DESC, phrase""".stripMargin

  /** q56 — PII scrubbing ([[Cleaning.scrubPii]]): emails, phone-shaped
    * digit groups, long digit runs → typed placeholders, with an exact
    * redaction count. The corpus tables carry no PII, so the input text is
    * derived IN-QUERY from `customer` (both engines build the identical
    * string) — the gate exercises the operator, not the synthesizer. */
  def q56PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val synth = Tables.customer(spark, dir).select(
      col("c_custkey"),
      concat(lit("contact "), col("c_name"), lit(" at user"),
        col("c_custkey").cast("string"), lit("@example.com or +1-555-"),
        (col("c_custkey") % 90 + 10).cast("string"), lit("-"),
        (col("c_custkey") * 7 % 90 + 10).cast("string"), lit(" ref "),
        (col("c_custkey") * lit(1000000007L)).cast("string"))
        .as("text"))
    Cleaning.scrubPii(synth, "text")
      .select(col("c_custkey"), col("scrubbed"), col("n_redactions"))
      .orderBy(col("c_custkey"))
  }

  val q56Sql: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{2,4}[-. ][0-9]{2,4}"
    val num = "[0-9]{9,}"
    """WITH t0 AS (
      |  SELECT c_custkey,
      |    'contact ' || c_name || ' at user' || c_custkey ||
      |    '@example.com or +1-555-' || (c_custkey % 90 + 10) || '-' ||
      |    (c_custkey * 7 % 90 + 10) || ' ref ' ||
      |    CAST(c_custkey * 1000000007 AS VARCHAR) AS text
      |  FROM customer),
      |t1 AS (
      |  SELECT c_custkey,
      |    len(regexp_extract_all(text, '__EMAIL__')) AS c1,
      |    regexp_replace(text, '__EMAIL__', '<EMAIL>', 'g') AS text
      |  FROM t0),
      |t2 AS (
      |  SELECT c_custkey, c1,
      |    len(regexp_extract_all(text, '__PHONE__')) AS c2,
      |    regexp_replace(text, '__PHONE__', '<PHONE>', 'g') AS text
      |  FROM t1),
      |t3 AS (
      |  SELECT c_custkey, c1, c2,
      |    len(regexp_extract_all(text, '__NUM__')) AS c3,
      |    regexp_replace(text, '__NUM__', '<NUM>', 'g') AS text
      |  FROM t2)
      |SELECT c_custkey, text AS scrubbed,
      |  CAST(c1 + c2 + c3 AS BIGINT) AS n_redactions
      |FROM t3
      |ORDER BY c_custkey""".stripMargin
      .replace("__EMAIL__", email)
      .replace("__PHONE__", phone)
      .replace("__NUM__", num)
  }
}
