package graft.ops

/**
 * Minimal RIFF/WAVE PCM codec — the audio twin of [[Ppm]]: a REAL wire
 * format (canonical 44-byte header + little-endian 16-bit PCM mono
 * payload) that needs no external codec library, so the engine's
 * byte-level build → parse → feature path is genuine, not a stub. Strict
 * parser: magic, PCM format tag, channel count, bit depth and chunk
 * bounds are all validated — corrupt payloads fail loudly rather than
 * decode into garbage features.
 */
object Wav {

  /** Fixed synthetic-corpus format: mono 16-bit PCM at 8 kHz. */
  val SampleRate = 8000

  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode int16 samples as a canonical 44-byte-header WAV file. */
  def encode(samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(out, 16, 16) // fmt chunk size
    le16(out, 20, 1) // PCM
    le16(out, 22, 1) // mono
    le32(out, 24, SampleRate)
    le32(out, 28, SampleRate * 2) // byte rate
    le16(out, 32, 2) // block align
    le16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      le16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid WAV: $msg")

  /** Strict decode of a canonical-layout PCM WAV to int16 samples. */
  def decode(bytes: Array[Byte]): Array[Short] = {
    if (bytes.length < 44) fail(s"truncated header (${bytes.length} bytes)")
    def tag(off: Int, s: String): Unit =
      if (!s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte))
        fail(s"missing '$s' tag at $off")
    tag(0, "RIFF"); tag(8, "WAVE"); tag(12, "fmt "); tag(36, "data")
    if (rd32(bytes, 16) != 16) fail(s"fmt chunk size ${rd32(bytes, 16)}")
    if (rd16(bytes, 20) != 1) fail(s"format tag ${rd16(bytes, 20)} (want PCM)")
    if (rd16(bytes, 22) != 1) fail(s"${rd16(bytes, 22)} channels (want mono)")
    if (rd16(bytes, 34) != 16) fail(s"${rd16(bytes, 34)} bits (want 16)")
    val dataSize = rd32(bytes, 40)
    if (dataSize < 0 || dataSize % 2 != 0 || 44 + dataSize > bytes.length)
      fail(s"data chunk $dataSize vs ${bytes.length} total")
    val n = dataSize / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = rd16(bytes, 44 + i * 2).toShort
      i += 1
    }
    out
  }
}
