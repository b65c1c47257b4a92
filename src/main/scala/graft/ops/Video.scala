package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Video-column operators — the third modality beside [[Ppm]] images
 * (q36) and [[Wav]] audio (q139), completing the multimodal tier with
 * the operation a video corpus actually needs at scale: FRAME SAMPLING
 * (decode the container header, pull every k-th frame, emit per-frame
 * features) without ever materializing the full frame set per row.
 *
 * Real codec tier, same discipline as PPM/WAV: production video codecs
 * (H.264 etc.) are not in this container, so the wire format is GRV1 —
 * an uncompressed motion-PPM container (ASCII header
 * `GRV1\n<nFrames> <w> <h> <fps>\n` + nFrames raw row-major RGB frames)
 * that still forces a genuine byte-level encode → header parse →
 * offset-seek → frame decode round trip. Pixels are deterministic
 * functions of (id, frame, x, y), so the DuckDB oracle recomputes every
 * sampled frame's channel means analytically — the byte path is
 * hash-checkable end to end.
 *
 * Scale shape: one typed `mapPartitions` pass per stage (one codec
 * context per partition, the [[Multimodal]] batch shape); the sampler
 * seeks straight to each sampled frame's byte offset (header arithmetic,
 * not a scan through skipped frames) and fans out one row per SAMPLED
 * frame — output mass is nFrames/stride per asset, never nFrames.
 */
object Video {

  /** Synthetic container geometry (small frames, variable frame count —
    * variable so the sampler's per-asset arithmetic is actually load-
    * bearing). */
  val FrmW = 8; val FrmH = 6; val Fps = 10

  /** 6..10 frames, a function of the asset id. */
  @inline def nFramesOf(id: Long): Int = (6 + (id % 5)).toInt

  /** Deterministic pixel functions of (id, frame, x, y) — the oracle
    * recomputes sampled-frame statistics from these analytically. */
  @inline def pxR(id: Long, f: Int, x: Int, y: Int): Int =
    ((id + 7L * x + 13L * y + 17L * f) % 256).toInt
  @inline def pxG(id: Long, f: Int, x: Int, y: Int): Int =
    ((3L * id + 5L * x + y + 19L * f) % 256).toInt
  @inline def pxB(id: Long, f: Int, x: Int, y: Int): Int =
    ((5L * id + x + 11L * y + 23L * f) % 256).toInt

  /** Assemble a GRV1 container from raw frames. */
  def encode(w: Int, h: Int, fps: Int,
             frames: Seq[Array[Byte]]): Array[Byte] = {
    val header = s"GRV1\n${frames.length} $w $h $fps\n"
      .getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + frames.length * w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    frames.foreach { fr =>
      require(fr.length == w * h * 3, s"frame size ${fr.length}")
      System.arraycopy(fr, 0, out, header.length + i * w * h * 3,
        fr.length)
      i += 1
    }
    out
  }

  /** Parse the header: (nFrames, w, h, fps, firstFrameByteOffset). */
  def decodeHeader(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
    require(bytes.length >= 5 &&
      new String(bytes, 0, 5, StandardCharsets.US_ASCII) == "GRV1\n",
      "not a GRV1 container")
    var i = 5
    def int(): Int = {
      while (bytes(i) == ' ' || bytes(i) == '\n') i += 1
      var v = 0
      while (bytes(i) >= '0' && bytes(i) <= '9') { v = v * 10 + (bytes(i) - '0'); i += 1 }
      v
    }
    val n = int(); val w = int(); val h = int(); val fps = int()
    i += 1 // the closing newline
    (n, w, h, fps, i)
  }

  /** Decode ONE frame by direct byte-offset seek (no scan through the
    * preceding frames). */
  def frameAt(bytes: Array[Byte], off: Int, w: Int, h: Int,
              idx: Int): Array[Byte] = {
    val sz = w * h * 3
    val out = new Array[Byte](sz)
    System.arraycopy(bytes, off + idx * sz, out, 0, sz)
    out
  }

  /** Rows of (id) → (id, real GRV1 payload) — the ingest stand-in. */
  def withVideoMedia(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val frames = (0 until nFramesOf(id)).map { f =>
            val rgb = new Array[Byte](FrmW * FrmH * 3)
            var y = 0
            while (y < FrmH) {
              var x = 0
              while (x < FrmW) {
                val o = (y * FrmW + x) * 3
                rgb(o) = pxR(id, f, x, y).toByte
                rgb(o + 1) = pxG(id, f, x, y).toByte
                rgb(o + 2) = pxB(id, f, x, y).toByte
                x += 1
              }
              y += 1
            }
            rgb
          }
          (id, encode(FrmW, FrmH, Fps, frames))
        }
      }
      .toDF(idCol, "media_grv")
  }

  /** One sampled frame's decoded features. */
  final case class FrameStats(doc_id: Long, n_frames: Int, frame_idx: Int,
                              ts_ms: Long, mean_r: Double, mean_g: Double,
                              mean_b: Double)

  /**
   * Frame-sample at `stride` (frames 0, stride, 2·stride, …): header
   * parse → offset seek per sampled frame → per-channel means. Output is
   * one row per SAMPLED frame with its timestamp (`frame_idx · 1000/fps`
   * ms) — the shape a caption/embedding stage consumes downstream.
   */
  def frameSampleStats(withMedia: DataFrame, stride: Int): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id").cast(LongType), col("media_grv"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val (n, w, h, fps, off) = decodeHeader(bytes)
        (0 until n by stride).map { f =>
          val rgb = frameAt(bytes, off, w, h, f)
          val (mr, mg, mb) = Ppm.channelMeans(rgb)
          FrameStats(id, n, f, f.toLong * 1000L / fps, mr, mg, mb)
        }
      }
      .toDF()
  }
}
