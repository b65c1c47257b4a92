package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for the large-scale training-data pipeline
 * (north-star extension — SURVEY.md §7.1 step 8). Everything is built from
 * codegen'd `org.apache.spark.sql.functions` so the whole stage stays inside
 * WholeStageCodegen — no UDFs, no driver round trips; all per-row, so they
 * scale embarrassingly at 100 TB.
 */
object TextAnalysis {

  /** Non-empty whitespace tokens. */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(words(text))

  /**
   * BPE-ish subword token count: runs of letters, runs of digits, or single
   * non-space symbols — a cheap proxy for tokenizer load estimation.
   * Same regex runs in the DuckDB oracle (RE2/Java common subset).
   */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Punctuation character ratio (quality signal). The default pattern is
    * Java-regex POSIX punct; pass an explicit class (e.g. "[.,!?;:]") when
    * the result must be reproducible in an RE2-dialect engine. */
  def punctRatio(text: Column, pattern: String = "[\\p{Punct}]"): Column =
    when(length(text) === 0, 0.0)
      .otherwise(
        (length(text) - length(regexp_replace(text, pattern, "")))
          .cast(DoubleType) / length(text))

  /** English stopword list used by the quality/language heuristics. */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "from")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, 0.0)
      .otherwise(size(array_intersect(ws, array(enStopwords.map(lit): _*)))
        .cast(DoubleType) / size(ws))
  }

  /**
   * Composite quality score in [0,1]: rewards mid-length documents with some
   * stopword glue and little punctuation. Pure fixed-order double arithmetic
   * over the signals above — bit-deterministic across engines (no rounding,
   * which differs between HALF_UP and banker's implementations).
   */
  def qualityScore(text: Column, punctPattern: String = "[\\p{Punct}]"): Column = {
    val lenScore = least(length(text).cast(DoubleType) / 200.0, lit(1.0))
    val sw = stopwordRatio(text)
    val punct = punctRatio(text, punctPattern)
    lenScore * 0.5 + sw * 0.3 + (lit(1.0) - punct) * 0.2
  }

  /**
   * Language-ID by stopword-hit heuristic: score = number of DISTINCT
   * language-marker tokens present; highest score wins, ties broken by the
   * fixed language order below. (A real system plugs a trained n-gram model
   * in here; the heuristic keeps the operator SQL-expressible for the
   * oracle gate.)
   */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(array_intersect(words(text), array(markers.map(lit): _*)))

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, m) => l -> langScore(text, m) }
    val best = greatest(scores.map(_._2): _*)
    // first language (in declaration order) achieving the max; 'und' if none hit
    scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Normalized exact fingerprint: md5 of lowercased, space-collapsed text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), " +", " "))
}
