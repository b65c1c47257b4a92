package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Cep
import graft.streaming.CepStream
import graft.streaming.CepStream.CepEvent

/** Streaming ≡ batch for the CEP matcher: the same transition function
  * under keyed micro-batch state must emit the identical match set for
  * every split of an ordered per-key log — including matches that OPEN
  * in one micro-batch and CLOSE in a later one. */
class CepStreamSpec extends SparkSpec {
  import spark.implicits._

  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val Span = 30L * 60L * 1000000L

  private def batchMatches(events: Seq[CepEvent]): Set[(Long, Long, Long, Long)] = {
    val df = events.toDF("user_id", "t", "event_id", "event_type")
    Cep.funnelMatches(df, "user_id", col("t"), col("event_id"),
        col("event_type"), "view", "click", "purchase", Span)
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  private def streamMatches(batches: Seq[Seq[CepEvent]],
                            name: String): Set[(Long, Long, Long, Long)] = {
    val input = MemoryStream[CepEvent]
    val q = CepStream.funnelMatches(input.toDS(), "view", "click",
        "purchase", Span)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[(Long, Long, Long, Long)].collect().toSet
    } finally q.stop()
  }

  test("quantified matcher: streaming ≡ batch across micro-batch splits") {
    val rnd = new scala.util.Random(23)
    val types = Array("view", "click", "purchase", "error")
    val events = (1 to 240).map(i => CepEvent((i % 5).toLong,
      i.toLong * 10L, i.toLong, types(rnd.nextInt(4))))
    val want = Cep.funnelMatchesQuant(
        events.toDF("user_id", "t", "event_id", "event_type"),
        "user_id", col("t"), col("event_id"), col("event_type"),
        "view", Set("click"), "purchase", minMid = 1L, maxMid = 2L,
        maxSpanUs = Span)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    for ((split, i) <- Seq(40, 80, 239).zipWithIndex) {
      val input = MemoryStream[CepEvent]
      val name = s"cep_quant_$i"
      val q = CepStream.funnelMatchesQuant(input.toDS(), "view",
          Set("click"), "purchase", minMid = 1L, maxMid = 2L,
          maxSpanUs = Span)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        events.grouped(split).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
        val got = spark.table(name)
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(got === want, s"split size $split")
      } finally q.stop()
    }
  }

  test("a match spanning three micro-batches emits once, exactly") {
    val got = streamMatches(Seq(
      Seq(CepEvent(1L, 10L, 0L, "view")),
      Seq(CepEvent(1L, 20L, 1L, "click"), CepEvent(1L, 25L, 2L, "click")),
      Seq(CepEvent(1L, 40L, 3L, "purchase"))), "cep_span")
    assert(got === Set((1L, 10L, 40L, 2L)))
  }

  test("a breaking event in a later batch kills the open run") {
    val got = streamMatches(Seq(
      Seq(CepEvent(1L, 10L, 0L, "view"), CepEvent(1L, 20L, 1L, "click")),
      Seq(CepEvent(1L, 30L, 2L, "error")),
      Seq(CepEvent(1L, 40L, 3L, "purchase"))), "cep_break")
    assert(got === Set.empty[(Long, Long, Long, Long)])
  }

  test("transformWithState twin emits the same matches as" +
    " flatMapGroupsWithState") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batches = Seq(
        Seq(CepEvent(1L, 10L, 0L, "view"), CepEvent(2L, 11L, 1L, "view")),
        Seq(CepEvent(1L, 20L, 2L, "click"), CepEvent(2L, 21L, 3L, "error")),
        Seq(CepEvent(1L, 30L, 4L, "purchase"),
          CepEvent(2L, 31L, 5L, "purchase")))
      val input = MemoryStream[CepEvent]
      val q = CepStream.funnelMatchesTws(input.toDS(), "view",
          Set("click"), "purchase", Span)
        .writeStream.format("memory").queryName("cep_tws")
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        val got = spark.table("cep_tws")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(got === streamMatches(batches, "cep_tws_ref"))
        assert(got === Set((1L, 10L, 30L, 1L))) // user 2's run broke
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("streaming ≡ batch on the sf0.001 events log for several splits") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        col("event_id").as("tie"), col("event_type").as("ty"))
      .as[CepEvent].collect().toSeq
      .sortBy(e => (e.t, e.tie)) // the ordered-log arrival contract
    val want = batchMatches(events)
    assert(want.nonEmpty)
    for ((nSplits, i) <- Seq(1, 3, 7).zipWithIndex) {
      val size = math.max(1, events.size / nSplits)
      val got = streamMatches(events.grouped(size).toSeq, s"cep_par$i")
      assert(got === want, s"splits = $nSplits")
    }
  }
}
