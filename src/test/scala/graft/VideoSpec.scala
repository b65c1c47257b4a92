package graft

import org.apache.spark.sql.functions._

import graft.ops.Video

/** GRV1 container codec + frame sampling: byte-level round trip, offset
  * seek, stride semantics, variable frame counts. */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  test("encode/decodeHeader round trip") {
    val frames = (0 until 3).map(_ =>
      Array.fill[Byte](Video.FrmW * Video.FrmH * 3)(7))
    val bytes = Video.encode(Video.FrmW, Video.FrmH, Video.Fps, frames)
    val (n, w, h, fps, off) = Video.decodeHeader(bytes)
    assert((n, w, h, fps) === (3, Video.FrmW, Video.FrmH, Video.Fps))
    assert(bytes.length === off + 3 * Video.FrmW * Video.FrmH * 3)
  }

  test("frameAt seeks to the exact frame bytes") {
    val frames = (0 until 4).map(i =>
      Array.fill[Byte](Video.FrmW * Video.FrmH * 3)(i.toByte))
    val bytes = Video.encode(Video.FrmW, Video.FrmH, Video.Fps, frames)
    val (_, w, h, _, off) = Video.decodeHeader(bytes)
    (0 until 4).foreach { i =>
      assert(Video.frameAt(bytes, off, w, h, i).toSeq ===
        frames(i).toSeq)
    }
  }

  test("rejects a non-GRV1 payload instead of decoding garbage") {
    intercept[IllegalArgumentException] {
      Video.decodeHeader("P6\n8 6\n255\n".getBytes)
    }
  }

  test("frameSampleStats: stride picks frames 0, s, 2s…, means match " +
      "the pixel functions, ts from fps") {
    val ids = Seq(0L, 3L, 9L)
    val out = Video.frameSampleStats(
        Video.withVideoMedia(ids.toDF("doc_id"), "doc_id"), stride = 3)
      .orderBy("doc_id", "frame_idx")
      .as[(Long, Int, Int, Long, Double, Double, Double)].collect()
    val want = ids.sorted.flatMap { id =>
      val n = Video.nFramesOf(id)
      (0 until n by 3).map { f =>
        val px = for (y <- 0 until Video.FrmH; x <- 0 until Video.FrmW)
          yield (Video.pxR(id, f, x, y), Video.pxG(id, f, x, y),
            Video.pxB(id, f, x, y))
        val cnt = (Video.FrmW * Video.FrmH).toDouble
        (id, n, f, f.toLong * 1000L / Video.Fps,
          px.map(_._1).sum / cnt, px.map(_._2).sum / cnt,
          px.map(_._3).sum / cnt)
      }
    }
    assert(out.toSeq === want)
    // variable frame counts are load-bearing: id 0 → 6 frames (2
    // sampled), id 3 → 9 frames (3 sampled), id 9 → 10 frames (4)
    assert(out.map(_._1).toSeq === Seq(0L, 0L, 3L, 3L, 3L, 9L, 9L, 9L, 9L))
  }
}
