package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Multimodal, TextAnalysis}

/**
 * q139-q140 — the audio/multimodal-assembly tier: REAL RIFF/WAVE PCM
 * build → strict parse → feature extraction ([[graft.ops.Wav]], the audio
 * twin of q36's PPM image path), and the per-document multimodal feature
 * assembly (text ⊕ image ⊕ audio) a training pipeline emits. Reference
 * scope: extends the LLM-pipeline surface the builder brief names; the
 * trends reference (trends.go) has no equivalent.
 *
 * Gate logic (the q36 convention): the payloads are deterministic
 * functions of doc_id, so the oracle recomputes every feature in CLOSED
 * FORM while the engine goes through the actual wire bytes — build,
 * 44-byte header, little-endian int16 payload, strict validation, decode.
 * A single byte-order or bounds bug anywhere in the codec breaks the
 * hash.
 */
object MediaQueries {

  private def audioFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeWavStats(
      Multimodal.withWavMedia(
        Tables.documents(spark, dir).select(col("doc_id")), "doc_id"))
      .withColumn("rms",
        sqrt(col("sum_sq").cast("double") / col("n_samples").cast("double")))

  /** q139 — audio feature extraction over real WAV binaries: per doc,
    * sample count, exact duration, peak amplitude, energy (integer sum of
    * squares), zero crossings and an every-4th-sample resample checksum —
    * all exact integers from the decoded byte stream, plus the one final
    * sqrt for rms. Map-only (encode and decode both live in
    * mapPartitions), co-partitioned with the scan at any scale. */
  def q139WavFeatures(spark: SparkSession, dir: String): DataFrame =
    audioFeatures(spark, dir)
      .select(col("doc_id"), col("n_samples"), col("duration_us"),
        col("peak_abs"), col("sum_sq"), col("zero_crossings"),
        col("sum_every4"), col("rms"))
      .orderBy(col("doc_id"))

  val q139Sql: String =
    """WITH s AS (
      |  SELECT doc_id, 256 + doc_id % 64 AS n,
      |    list_transform(range(256 + doc_id % 64),
      |      i -> (doc_id * 31 + i * 17) % 65536 - 32768) AS smp
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(n * 125 AS BIGINT) AS duration_us,
      |  CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT)
      |    AS peak_abs,
      |  CAST(list_sum(list_transform(smp, x -> x * x)) AS BIGINT) AS sum_sq,
      |  CAST(len(list_filter(range(n - 1), i -> smp[i+1] * smp[i+2] < 0))
      |    AS BIGINT) AS zero_crossings,
      |  CAST(list_sum(list_transform(list_filter(range(n), i -> i % 4 = 0),
      |    i -> smp[i+1])) AS BIGINT) AS sum_every4,
      |  sqrt(CAST(list_sum(list_transform(smp, x -> x * x)) AS DOUBLE)
      |    / CAST(n AS BIGINT)) AS rms
      |FROM s
      |ORDER BY doc_id""".stripMargin

  /** q140 — multimodal feature assembly: one row per document fusing the
    * text (BPE token count), image (decoded PPM red-channel mean, q36's
    * codec) and audio (decoded WAV rms + duration, q139's codec)
    * modalities — the joined feature record a multimodal training
    * pipeline materializes. Three map-only feature branches co-partitioned
    * by doc_id, two hash joins. */
  def q140MultimodalAssembly(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val txt = docs.select(col("doc_id"),
      TextAnalysis.tokenCountBpe(col("text")).cast("long").as("n_tokens_bpe"))
    val img = Multimodal.decodePpmStats(
      Multimodal.withPpmMedia(docs.select(col("doc_id")), "doc_id"))
      .select(col("doc_id"), col("mean_r").as("img_mean_r"))
    val au = audioFeatures(spark, dir)
      .select(col("doc_id"), col("duration_us").as("audio_us"),
        col("rms").as("audio_rms"))
    txt.join(img, "doc_id").join(au, "doc_id")
      .orderBy(col("doc_id"))
  }

  val q140Sql: String =
    s"""WITH txt AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text,
       |      '${TextAnalysis.bpeTokenPattern}')) AS BIGINT) AS n_tokens_bpe
       |  FROM documents),
       |img AS (
       |  SELECT doc_id,
       |    CAST(list_sum(flatten(list_transform(range(12), y ->
       |        list_transform(range(16), x ->
       |          (doc_id + 7 * x + 13 * y) % 256)))) AS DOUBLE)
       |      / 192 AS img_mean_r
       |  FROM documents),
       |au AS (
       |  SELECT doc_id,
       |    CAST((256 + doc_id % 64) * 125 AS BIGINT) AS audio_us,
       |    sqrt(CAST(list_sum(list_transform(range(256 + doc_id % 64),
       |        i -> ((doc_id * 31 + i * 17) % 65536 - 32768)
       |           * ((doc_id * 31 + i * 17) % 65536 - 32768))) AS DOUBLE)
       |      / CAST(256 + doc_id % 64 AS BIGINT)) AS audio_rms
       |  FROM documents)
       |SELECT doc_id, n_tokens_bpe, img_mean_r, audio_us, audio_rms
       |FROM txt JOIN img USING (doc_id) JOIN au USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** q192 — VIDEO frame sampling ([[graft.ops.Video.frameSampleStats]]):
    * the third modality, completing image (q36) / audio (q139). Encodes
    * a real GRV1 container per document (variable 6–10 frame count, so
    * the per-asset sampling arithmetic is load-bearing), then header
    * parse → byte-offset seek → decode every 3rd frame → per-channel
    * means + frame timestamp. Output mass is nFrames/stride per asset —
    * the caption/embed-ready sampled-frame table, never the full frame
    * set. The oracle recomputes each sampled frame's means analytically
    * from the deterministic pixel functions, so the whole byte path
    * (encode, header, seek, decode) is hash-checked. */
  def q192VideoFrames(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Video.frameSampleStats(
        graft.ops.Video.withVideoMedia(
          Tables.documents(spark, dir), "doc_id"), stride = 3)
      .orderBy(col("doc_id"), col("frame_idx"))

  val q192Sql: String = {
    def mean(px: String): String =
      s"""CAST(list_sum(flatten(list_transform(range(6), y ->
         |      list_transform(range(8), x ->
         |        CAST(($px) % 256 AS DOUBLE))))) AS DOUBLE) / 48""".stripMargin
    s"""WITH f AS (
       |  SELECT doc_id, CAST(6 + doc_id % 5 AS INTEGER) AS n_frames,
       |    CAST(u.f AS INTEGER) AS frame_idx
       |  FROM documents,
       |    UNNEST(list_filter(range(6 + doc_id % 5),
       |      f -> f % 3 = 0)) AS u(f))
       |SELECT doc_id, n_frames, frame_idx,
       |  CAST(frame_idx * 100 AS BIGINT) AS ts_ms,
       |  ${mean("doc_id + 7*x + 13*y + 17*frame_idx")} AS mean_r,
       |  ${mean("3*doc_id + 5*x + y + 19*frame_idx")} AS mean_g,
       |  ${mean("5*doc_id + x + 11*y + 23*frame_idx")} AS mean_b
       |FROM f
       |ORDER BY doc_id, frame_idx""".stripMargin
  }
}
