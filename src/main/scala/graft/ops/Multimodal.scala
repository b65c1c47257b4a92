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
 * The actual codec work (JPEG decode, resampling, frame extraction) needs
 * native libraries that are NOT in this container, so the decode kernels are
 * STUBS — `decodeStub`/`frameSample` produce deterministic fake outputs from
 * the real bytes. Everything around them (schema, batching, partitioning,
 * the shape of the exchange) is real Spark and is what matters at 100 TB:
 * per-row codegen'd byte ops, no driver collect, explode for frame fan-out.
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
}
