package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column operators (north-star extension): image/audio/video
 * payloads travel as opaque `binary` columns with a typed metadata struct,
 * exactly like a production lakehouse layout (bytes + sidecar metadata, one
 * row per asset; huge assets would hold a storage URI instead).
 *
 * Two tiers:
 *  - REAL codec tier (PPM): binary NetPBM needs no native library, so
 *    `withPpmMedia`/`decodePpmStats` do a genuine byte-level encode →
 *    decode → resize → re-decode round trip (typed mapPartitions — one
 *    codec context per partition), oracle-checked analytically (q36).
 *  - STUB tier: JPEG/audio/video codecs are NOT in this container, so
 *    `decodeStub`/`resizeStub` produce deterministic fake outputs from the
 *    real bytes, keeping the production signatures and batch shapes.
 * Everything around the kernels (schema, batching, partitioning, explode
 * fan-out, no driver collect) is real Spark — the part that matters at
 * 100 TB.
 */
object Multimodal {

  /** Typed metadata carried beside the raw bytes. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  /**
   * Attach a deterministic fake media payload to each document: bytes =
   * UTF-8 of the text (stand-in for real image bytes), metadata derived from
   * stable hashes. In production this column comes from the ingest source.
   */
  def withFakeMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("media_bytes", encode(col(textCol), "UTF-8").cast(BinaryType))
      .withColumn("media_meta", struct(
        lit("image/fake").as("mime"),
        (pmod(hash(col(idCol)), lit(1920)) + 1).cast(IntegerType).as("width"),
        (pmod(hash(col(idCol), lit(1)), lit(1080)) + 1).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("duration_ms")))

  /** Byte length + content hash — the cheap metadata pass that runs before
    * any expensive decode in a real pipeline (codegen'd, pushdown-friendly). */
  def mediaStats(bytes: Column): (Column, Column) =
    (length(bytes), sha2(bytes, 256))

  /**
   * STUB decode: a real implementation shells into a codec over
   * `mapPartitions` (batch-at-a-time, one codec context per partition).
   * The stub derives a deterministic d-dim "feature vector" from the bytes'
   * xxhash64 under d seeds — same signature, same batch shape, fake math.
   */
  def decodeStub(bytes: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(bytes, i), lit(2000000)).cast(DoubleType) / 1000000.0) - 1.0)

  /**
   * STUB resize: keeps the contract (bytes → bytes, target box in metadata)
   * while the kernel just truncates — stands in for a real thumbnailer.
   */
  def resizeStub(bytes: Column, maxBytes: Int): Column =
    substring(bytes, 1, maxBytes)

  // ------------------------------------------------ real decode tier (PPM)

  /** Synthetic image geometry for the real-decode tier. */
  val ImgW = 16; val ImgH = 12
  val ThumbW = 4; val ThumbH = 3

  /** Deterministic pixel functions of (id, x, y) — the oracle recomputes the
    * decoded statistics from these analytically (ExtQueries.q36Sql), which
    * is what makes a BYTE-level codec round-trip hash-checkable. */
  @inline def pxR(id: Long, x: Int, y: Int): Int = ((id + 7L * x + 13L * y) % 256).toInt
  @inline def pxG(id: Long, x: Int, y: Int): Int = ((3L * id + 5L * x + y) % 256).toInt
  @inline def pxB(id: Long, x: Int, y: Int): Int = ((5L * id + x + 11L * y) % 256).toInt

  /** Rows of (id) → (id, real binary PPM payload). mapPartitions = the
    * one-codec-context-per-partition shape a real encoder would use; this IS
    * the genuine per-partition imperative logic the RDD/typed tier is for. */
  def withPpmMedia(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val rgb = new Array[Byte](ImgW * ImgH * 3)
          var y = 0
          while (y < ImgH) {
            var x = 0
            while (x < ImgW) {
              val o = (y * ImgW + x) * 3
              rgb(o) = pxR(id, x, y).toByte
              rgb(o + 1) = pxG(id, x, y).toByte
              rgb(o + 2) = pxB(id, x, y).toByte
              x += 1
            }
            y += 1
          }
          (id, Ppm.encode(ImgW, ImgH, rgb))
        }
      }
      .toDF(idCol, "media_ppm")
  }

  /** Typed result of the decode → stats → resize → re-decode pipeline. */
  final case class PpmStats(doc_id: Long, width: Int, height: Int,
                            mean_r: Double, mean_g: Double, mean_b: Double,
                            thumb_width: Int, thumb_height: Int,
                            thumb_mean_r: Double)

  /**
   * REAL decode kernel: parse the PPM header + pixels, compute per-channel
   * means, nearest-neighbor resize, re-encode, decode the thumbnail again
   * and take its red mean — a full byte-level round trip through the wire
   * format, batched per partition (no UDF boxing per value: one typed
   * mapPartitions pass).
   */
  def decodePpmStats(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id").cast(LongType), col("media_ppm"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (w, h, rgb) = Ppm.decode(bytes)
          val (mr, mg, mb) = Ppm.channelMeans(rgb)
          val thumbBytes = Ppm.encode(ThumbW, ThumbH,
            Ppm.resizeNearest(w, h, rgb, ThumbW, ThumbH))
          val (tw, th, trgb) = Ppm.decode(thumbBytes)
          val (tmr, _, _) = Ppm.channelMeans(trgb)
          PpmStats(id, w, h, mr, mg, mb, tw, th, tmr)
        }
      }
      .toDF()
  }

  /**
   * Frame sampling for video-ish payloads: fan one asset row out to
   * `nFrames` frame rows (explode — the real shuffle/fan-out shape), each
   * frame being a deterministic byte slice + its decode-stub features.
   * Returns (original columns) + frame_idx, frame_bytes, frame_features.
   */
  def frameSample(df: DataFrame, bytesCol: String, nFrames: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_bytes",
        substring(col(bytesCol),
          (col("frame_idx") * (length(col(bytesCol)) / nFrames) + 1).cast(IntegerType),
          greatest((length(col(bytesCol)) / nFrames).cast(IntegerType), lit(1))))
      .withColumn("frame_features", decodeStub(col("frame_bytes"), 4))

  // ------------------------------------------------------------- audio tier

  /** Deterministic synthetic audio for the real-decode tier: per id, a
    * variable-length int16 sample stream the oracle can recompute in
    * closed form (same convention as [[pxR]]/[[pxG]]/[[pxB]]). */
  def wavSampleCount(id: Long): Int = 256 + (id % 64).toInt
  @inline def wavSample(id: Long, i: Int): Int =
    (((id * 31L + i * 17L) % 65536L) - 32768L).toInt

  /** Rows of (id) → (id, real RIFF/WAVE PCM payload) via [[Wav.encode]] —
    * one codec pass per partition, the [[withPpmMedia]] shape. */
  def withWavMedia(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = wavSampleCount(id)
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = wavSample(id, i).toShort; i += 1 }
          (id, Wav.encode(s))
        }
      }
      .toDF(idCol, "media_wav")
  }

  /** Typed result of the WAV parse → feature-extract pass. Every field is
    * an exact integer (rms stays as the integer sum of squares; take the
    * one sqrt downstream), so the features hash-gate across engines. */
  final case class WavStats(doc_id: Long, n_samples: Long, duration_us: Long,
                            peak_abs: Long, sum_sq: Long,
                            zero_crossings: Long, sum_every4: Long)

  /**
   * REAL audio decode kernel: strict-parse the RIFF container
   * ([[Wav.decode]] — magic, PCM tag, mono, 16-bit, chunk bounds all
   * validated), then one pass over the samples for peak / energy /
   * zero-crossing / every-4th-sample-resample features. Batched per
   * partition like [[decodePpmStats]]; map-only, co-partitioned with the
   * scan at any scale.
   */
  def decodeWavStats(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id").cast(LongType), col("media_wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val s = Wav.decode(bytes)
          var i = 0
          var peak = 0L; var sumSq = 0L; var zc = 0L; var every4 = 0L
          while (i < s.length) {
            val v = s(i).toLong
            val a = math.abs(v)
            if (a > peak) peak = a
            sumSq += v * v
            if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
            if (i % 4 == 0) every4 += v
            i += 1
          }
          WavStats(id, s.length.toLong,
            s.length.toLong * 1000000L / Wav.SampleRate,
            peak, sumSq, zc, every4)
        }
      }
      .toDF()
  }
}
