package graft

import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Wav}

/** The WAV codec's contract: byte-exact round trip, canonical header
  * layout, strict rejection of malformed containers, and the feature
  * kernel's edges (zero crossings, every-4th resample, empty stream). */
class WavSpec extends SparkSpec {
  import spark.implicits._

  test("round trip: decode(encode(s)) == s, including extremes") {
    val s = Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 1234, -4321)
    assert(Wav.decode(Wav.encode(s)).toSeq === s.toSeq)
    assert(Wav.decode(Wav.encode(Array.empty[Short])).length === 0)
  }

  test("canonical header: 44 bytes, RIFF/WAVE/fmt/data tags, LE sizes") {
    val b = Wav.encode(Array[Short](7, -7))
    assert(b.length === 48)
    assert(new String(b.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") === "WAVE")
    assert(new String(b.slice(36, 40), "US-ASCII") === "data")
    assert((b(40) & 0xff) === 4) // data size 4, little-endian low byte
    assert((b(22) & 0xff) === 1) // mono
    assert((b(34) & 0xff) === 16) // 16-bit
  }

  test("strict parser rejects malformed containers") {
    val good = Wav.encode(Array[Short](1, 2, 3))
    def corrupt(off: Int, v: Byte): Array[Byte] = {
      val c = good.clone(); c(off) = v; c
    }
    intercept[IllegalArgumentException](Wav.decode(good.take(10)))
    intercept[IllegalArgumentException](Wav.decode(corrupt(0, 'X'.toByte)))
    intercept[IllegalArgumentException](Wav.decode(corrupt(20, 2))) // fmt tag
    intercept[IllegalArgumentException](Wav.decode(corrupt(22, 2))) // stereo
    intercept[IllegalArgumentException](Wav.decode(corrupt(34, 8))) // 8-bit
    // data size exceeding the buffer
    intercept[IllegalArgumentException](Wav.decode(corrupt(40, 99)))
  }

  test("decodeWavStats features match a hand computation") {
    val s = Array[Short](3, -2, 0, 5, -5, -1, 2)
    val df = Seq((42L, Wav.encode(s))).toDF("doc_id", "media_wav")
    val r = Multimodal.decodeWavStats(df).collect().head
    assert(r.getAs[Long]("n_samples") === 7L)
    assert(r.getAs[Long]("duration_us") === 7L * 1000000L / 8000L)
    assert(r.getAs[Long]("peak_abs") === 5L)
    assert(r.getAs[Long]("sum_sq") === (9 + 4 + 0 + 25 + 25 + 1 + 4).toLong)
    // sign flips: 3→-2, 5→-5, -1→2 (zeros break a crossing)
    assert(r.getAs[Long]("zero_crossings") === 3L)
    assert(r.getAs[Long]("sum_every4") === (3 - 5).toLong) // indices 0, 4
  }

  test("withWavMedia payloads decode back to the generator formula") {
    val df = Multimodal.withWavMedia(Seq(0L, 5L, 63L).toDF("doc_id"), "doc_id")
    df.collect().foreach { row =>
      val id = row.getLong(0)
      val s = Wav.decode(row.getAs[Array[Byte]](1))
      assert(s.length === Multimodal.wavSampleCount(id))
      s.indices.foreach(i =>
        assert(s(i).toInt === Multimodal.wavSample(id, i)))
    }
  }
}
