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

  /**
   * Per-document repetition signals — the Gopher-report-style quality
   * gate that catches degenerate generated/boilerplate text BEFORE the
   * (much costlier) near-dup tiers: a doc that is one phrase looped is
   * not a duplicate of anything, it is just garbage.
   *
   * All outputs are INTEGERS (counts, never ratios), so the gate's
   * decision arithmetic is exact and engine-independent:
   *  - n_words / n_distinct_words / top_word_count — word-level
   *    concentration (`top_word_count * 5 > n_words` ≙ "top word over
   *    20% of the doc");
   *  - n_trigrams / n_distinct_trigrams — phrase-level looping
   *    (`(n_trigrams − n_distinct_trigrams) * 2 > n_trigrams` ≙ "over
   *    half the trigram stream is repeats").
   * `is_repetitive` is the disjunction of the two.
   *
   * Scale shape: two explode → hash-aggregate pipelines keyed by
   * (doc, token) with map-side partial aggregation, then a co-keyed
   * per-doc join — linear in corpus size, per-key cardinality bounded by
   * document length, no pairwise anything.
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    val base = df.select(col(idCol), ws.as("__ws"))
    val trigramArr = when(size(col("__ws")) < 3,
        array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(col("__ws")) - 3),
        i => concat_ws(" ", element_at(col("__ws"), i + 1),
          element_at(col("__ws"), i + 2), element_at(col("__ws"), i + 3))))
    val wordStats = base
      .select(col(idCol), explode(col("__ws")).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("__c")).as("top_word_count"))
    val triStats = base
      .select(col(idCol), explode(trigramArr).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_trigrams"),
        count(lit(1)).as("n_distinct_trigrams"))
    df.select(col(idCol))
      .join(wordStats, Seq(idCol), "left")
      .join(triStats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_distinct_words"), lit(0L)).as("n_distinct_words"),
        coalesce(col("top_word_count"), lit(0L)).as("top_word_count"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_distinct_trigrams"), lit(0L))
          .as("n_distinct_trigrams"))
      .withColumn("is_repetitive",
        (col("top_word_count") * 5 > col("n_words")) ||
          ((col("n_trigrams") - col("n_distinct_trigrams")) * 2
            > col("n_trigrams")))
  }

  /**
   * C4-style line-level cleaning (the Raffel et al. heuristics, the
   * standard pre-dedup pass for web corpora): keep a line iff it
   *  - ends in terminal punctuation (`.` `!` `?`),
   *  - has at least `minWords` whitespace-separated words, and
   *  - contains none of the blocklist markers (lowercased substring
   *    match — `javascript`, `lorem ipsum`, `cookie`, `{`);
   * then keep the DOCUMENT iff at least `minLines` lines survive.
   *
   * Entirely MAP-ONLY: the line array never explodes into rows — split,
   * nested `filter` lambdas and `concat_ws` run per-row inside one
   * codegen stage, so the pass costs a scan regardless of corpus size
   * (the boilerplate/repetition passes above are the ones that need
   * shuffles; C4 rules are per-document by construction).
   *
   * Output: one row per input doc — n_lines (non-empty), n_kept,
   * kept_chars, cleaned (kept lines re-joined with \n) and doc_kept.
   */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 5, minLines: Int = 3): DataFrame = {
    val lines = filter(
      transform(split(col(textCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    def wordCount(l: Column): Column =
      size(filter(split(l, " "), w => length(w) > 0))
    val kept = filter(lines, l =>
      right(l, lit(1)).isin(".", "!", "?") &&
        wordCount(l) >= minWords &&
        !contains(lower(l), lit("javascript")) &&
        !contains(lower(l), lit("lorem ipsum")) &&
        !contains(lower(l), lit("cookie")) &&
        !contains(l, lit("{")))
    df.select(col(idCol), lines.as("__lines"), kept.as("__kept"))
      .select(col(idCol),
        size(col("__lines")).as("n_lines"),
        size(col("__kept")).as("n_kept"),
        aggregate(col("__kept"), lit(0L),
          (acc, l) => acc + length(l)).as("kept_chars"),
        concat_ws("\n", col("__kept")).as("cleaned"))
      .withColumn("doc_kept", col("n_kept") >= minLines)
  }
}
