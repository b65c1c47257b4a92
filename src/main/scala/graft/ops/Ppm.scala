package graft.ops

import java.nio.charset.StandardCharsets

/**
 * Minimal binary NetPBM (P6) codec in pure JVM — the one raster format that
 * needs no native library, which lets the multimodal tier have a REAL
 * decode/resize kernel instead of a stub: bytes genuinely round-trip
 * through the wire format (`P6\n<w> <h>\n255\n<rgb bytes>`), and the
 * decoded statistics are oracle-checked analytically (ExtQueries.q36Sql).
 */
object Ppm {

  /** Encode an RGB buffer (3 bytes/pixel, row-major) as binary PPM. */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb buffer size mismatch")
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decode binary PPM → (width, height, rgb bytes). Fail-fast on anything
    * that is not a well-formed maxval-255 P6 payload. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def token(): String = {
      while (bytes(pos) == ' ' || bytes(pos) == '\n' || bytes(pos) == '\t' ||
        bytes(pos) == '\r') pos += 1
      val start = pos
      while (pos < bytes.length && bytes(pos) != ' ' && bytes(pos) != '\n' &&
        bytes(pos) != '\t' && bytes(pos) != '\r') pos += 1
      new String(bytes, start, pos - start, StandardCharsets.US_ASCII)
    }
    require(token() == "P6", "not a P6 PPM")
    val (w, h) = (token().toInt, token().toInt)
    require(token() == "255", "unsupported maxval")
    pos += 1 // single whitespace after maxval
    val rgb = java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3)
    (w, h, rgb)
  }

  /** Nearest-neighbor resize of an RGB buffer. */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte],
                    nw: Int, nh: Int): Array[Byte] = {
    val out = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      val sy = y * h / nh
      var x = 0
      while (x < nw) {
        val sx = x * w / nw
        var c = 0
        while (c < 3) {
          out((y * nw + x) * 3 + c) = rgb((sy * w + sx) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-channel means of an RGB buffer (exact: small-int sums in Long). */
  def channelMeans(rgb: Array[Byte]): (Double, Double, Double) = {
    var (r, g, b) = (0L, 0L, 0L)
    var i = 0
    while (i < rgb.length) {
      r += rgb(i) & 0xff; g += rgb(i + 1) & 0xff; b += rgb(i + 2) & 0xff
      i += 3
    }
    val n = (rgb.length / 3).toDouble
    (r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }
}
