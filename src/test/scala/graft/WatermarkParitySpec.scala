package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming↔batch watermark parity (the semantics q160 accounts for in
  * batch): drive a watermarked windowed aggregation ONE EVENT PER
  * MICRO-BATCH, so the engine's global watermark after batch i is
  * exactly max(event time of arrivals < i+1) − delay, and assert the
  * engine's own numRowsDroppedByWatermark equals the arrival-order
  * simulation — the same high-water-mark rule PrefixScan states in
  * batch. */
class WatermarkParitySpec extends SparkSpec {
  import spark.implicits._

  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def at(sec: Long) = new Timestamp(t0 + sec * 1000)

  test("engine drop count equals the arrival-order watermark simulation") {
    // 60s tumbling windows, 30s allowed lateness. Offsets chosen off
    // every boundary so <= vs < at the watermark line cannot matter.
    val arrivals = Seq(100L, 200L, 90L, 130L, 300L, 110L, 310L)
    // simulate: hwm before event i = max(prior event times) − 30s;
    // a late row drops iff its window END (next 60s boundary) ≤ hwm
    var seenMax = Long.MinValue
    var expectedDrops = 0L
    arrivals.foreach { s =>
      val hwm = if (seenMax == Long.MinValue) Long.MinValue
        else seenMax - 30L
      val windowEnd = (s / 60L + 1L) * 60L
      if (hwm != Long.MinValue && windowEnd <= hwm) expectedDrops += 1
      seenMax = math.max(seenMax, s)
    }
    assert(expectedDrops === 2L) // offsets 90 and 110 arrive too late

    val input = MemoryStream[Timestamp]
    val q = input.toDF().toDF("ts")
      .withWatermark("ts", "30 seconds")
      .groupBy(window(col("ts"), "60 seconds"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("wm_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      arrivals.foreach { s =>
        input.addData(at(s))
        q.processAllAvailable() // one micro-batch per arrival
      }
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped === expectedDrops)
      // the emitted (finalized) windows exclude the dropped rows: the
      // [60,120) window holds ONLY the on-time offset-100 arrival
      val emitted = spark.table("wm_parity").collect()
        .map(r => (r.getStruct(0).getTimestamp(0).getTime - t0) / 1000 ->
          r.getAs[Long]("n")).toMap
      assert(emitted.get(60L) === Some(1L))
      assert(emitted.get(120L) === Some(1L)) // offset 130, kept though late
    } finally q.stop()
  }
}
