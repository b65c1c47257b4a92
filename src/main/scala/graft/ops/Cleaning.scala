package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-cleaning operators: boilerplate detection and PII scrubbing —
 * the CommonCrawl-style hygiene passes that run before dedup in a
 * training-data pipeline.
 *
 * Boilerplate: a line (nav menu, footer, cookie banner) that recurs across
 * many DISTINCT documents is template, not content. Detection is
 * explode-lines → distinct(doc, line) → count docs per line — two shuffles
 * on the line hash, both with map-side partial aggregation; no pairwise
 * comparison anywhere, so it scales linearly where near-dup methods are
 * quadratic-ish. The doc-frequency table is typically tiny relative to the
 * corpus (templates repeat!) and broadcasts back for per-doc ratios.
 *
 * PII scrubbing is per-row regexp_replace chains — map-only, codegen'd.
 * Patterns stay in the Java∩RE2 regex subset (no backrefs, no lookaround)
 * so an RE2-dialect engine (and the DuckDB oracle) reproduces them.
 */
object Cleaning {

  /** Non-empty trimmed lines of `textCol`, one row per (id, line_no, line).
    * line_no is the 1-based position among ALL lines (empties counted), so
    * provenance survives the filter. */
  def explodeLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "raw_line")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("line_no"),
        trim(col("raw_line")).as("line"))
      .filter(length(col("line")) > 0)

  /** Lines occurring in ≥ `minDocs` distinct documents, with their
    * document frequency: the boilerplate dictionary. */
  def boilerplateLines(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Int): DataFrame =
    explodeLines(df, idCol, textCol)
      .select(col(idCol), col("line")).distinct()
      .groupBy(col("line")).agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Per-document boilerplate share: total lines vs lines found in the
    * dictionary (broadcast — it is small by construction). */
  def boilerplateRatio(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Int): DataFrame = {
    val dict = boilerplateLines(df, idCol, textCol, minDocs)
      .select(col("line"))
    val lines = explodeLines(df, idCol, textCol)
    lines
      .join(broadcast(dict).withColumn("is_bp", lit(1L)), Seq("line"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(coalesce(col("is_bp"), lit(0L))).as("n_boilerplate"))
  }

  /** (pattern, replacement) scrub rules in the Java∩RE2 subset. Email,
    * then phone-ish digit runs, then long digit sequences (ids/SSNs).
    * Order matters: emails contain digits, so they scrub first. */
  val defaultPiiRules: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{2,4}[-. ][0-9]{2,4}", "<PHONE>"),
    ("[0-9]{9,}", "<NUM>"))

  /** Apply the scrub chain to `textCol`; adds `scrubbed` plus an exact
    * `n_redactions` count. Each rule's matches are counted on the text AS
    * THE RULE SEES IT (after earlier rules ran), so a digit run inside an
    * already-scrubbed email is not double-counted — the count is exactly
    * the number of replacement tokens inserted. */
  def scrubPii(df: DataFrame, textCol: String,
               rules: Seq[(String, String)] = defaultPiiRules): DataFrame = {
    val (scrubbed, counts) =
      rules.foldLeft((col(textCol), Vector.empty[Column])) {
        case ((c, acc), (pat, rep)) =>
          val n = size(regexp_extract_all(c, lit(pat), lit(0)))
          (regexp_replace(c, pat, rep), acc :+ n)
      }
    df.withColumn("scrubbed", scrubbed)
      .withColumn("n_redactions", counts.reduce(_ + _).cast("long"))
  }
}
