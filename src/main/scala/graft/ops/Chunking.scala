package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Document chunking: split long documents into fixed-size, optionally
 * overlapping character windows — the shape LLM training and embedding
 * pipelines feed to tokenizers ("512-char chunks, 128-char overlap").
 *
 * Chunk starts are the arithmetic sequence 1, 1+stride, 1+2·stride, …
 * while start ≤ length(text) (every document yields ≥ 1 chunk, even the
 * empty one), so the expansion is `sequence` + `explode` + `substr` —
 * pure codegen'd per-row work, no shuffle at all: chunking 100 TB is a
 * map-only stage whose output co-partitions with its input. The last
 * chunk is naturally short (`substr` clamps at the end of the string).
 */
object Chunking {

  /** One row per (doc, chunk): id, chunk_idx (0-based), chunk_start
    * (1-based char offset), chunk_len, chunk text. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"size=$size stride=$stride must be > 0")
    val piece = col(textCol).substr(col("chunk_start"), lit(size))
    df.select(col(idCol),
        explode(sequence(lit(1), greatest(length(col(textCol)), lit(1)),
          lit(stride))).as("chunk_start"),
        col(textCol))
      .select(
        col(idCol),
        // `div` = integral division (Column `/` is double division, which
        // could round a large offset); starts are 1-based multiples of
        // stride so this recovers the exact 0-based index
        expr(s"(chunk_start - 1) div $stride").cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        length(piece).as("chunk_len"),
        piece.as("chunk"))
  }

  /**
   * Fill-in-the-middle (FIM) sample construction (Bavarian et al. 2022):
   * split each document's word sequence into (prefix, middle, suffix) at
   * DETERMINISTIC points — prefix = first ⌊nw/2⌋ words, middle = next
   * ⌊nw/4⌋, suffix = the rest — so the transform is reproducible across
   * engines, partitionings and retries (the training-data requirement;
   * rand() splits are not replayable). Docs under `minWords` pass through
   * untransformed (`is_fim = false`, whole text as prefix, empty
   * middle/suffix).
   *
   * Map-only: words → two integer split points → three `slice`s, zero
   * shuffle; chunking 100 TB of documents into FIM triples co-partitions
   * with the scan.
   */
  def fimSplit(df: DataFrame, textCol: String,
               minWords: Int = 4): DataFrame = {
    val keep = df.columns.filterNot(_ == textCol).map(col).toSeq
    val p = expr("size(__ws) div 2")
    val m = expr("size(__ws) div 4")
    df.withColumn("__ws", TextAnalysis.words(col(textCol)))
      .select(keep ++ Seq(
        size(col("__ws")).cast("long").as("nw"),
        (size(col("__ws")) >= minWords).as("is_fim"),
        when(size(col("__ws")) >= minWords, slice(col("__ws"), lit(1), p))
          .otherwise(col("__ws")).as("prefix_w"),
        when(size(col("__ws")) >= minWords, slice(col("__ws"), p + 1, m))
          .otherwise(array().cast("array<string>")).as("middle_w"),
        when(size(col("__ws")) >= minWords,
            slice(col("__ws"), p + m + 1, size(col("__ws")) - p - m))
          .otherwise(array().cast("array<string>")).as("suffix_w")): _*)
  }
}
