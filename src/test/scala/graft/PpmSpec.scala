package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ppm

/** Pure-JVM PPM codec: encode/decode round trip, resize, channel stats. */
class PpmSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = ((x * 16) % 256).toByte
      rgb(o + 1) = ((y * 16) % 256).toByte
      rgb(o + 2) = 7.toByte
    }
    rgb
  }

  test("encode → decode round trip preserves geometry and bytes") {
    val rgb = gradient(16, 12)
    val (w, h, back) = Ppm.decode(Ppm.encode(16, 12, rgb))
    assert((w, h) === ((16, 12)))
    assert(back.toSeq === rgb.toSeq)
  }

  test("decode rejects non-PPM payloads") {
    intercept[Exception](Ppm.decode("JFIF garbage".getBytes))
  }

  test("nearest-neighbor resize picks the expected source pixels") {
    val rgb = gradient(16, 12)
    val thumb = Ppm.resizeNearest(16, 12, rgb, 4, 3)
    // thumb pixel (x, y) = src (4x, 4y)
    for (y <- 0 until 3; x <- 0 until 4) {
      val t = (y * 4 + x) * 3
      val s = (4 * y * 16 + 4 * x) * 3
      assert(thumb(t) === rgb(s) && thumb(t + 1) === rgb(s + 1))
    }
  }

  test("channel means are exact (255-heavy values don't overflow)") {
    val solid = Array.fill(8 * 8 * 3)(255.toByte)
    val (r, g, b) = Ppm.channelMeans(solid)
    assert((r, g, b) === ((255.0, 255.0, 255.0)))
  }
}
