package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Cep

/** The sequential pattern matcher (q165's engine): hand-pinned edge
  * semantics of `view (click)* purchase`, and exact parity with an
  * independent declarative (window-function) twin on real event data
  * under scrambled partitioning. */
class CepSpec extends SparkSpec {
  import spark.implicits._

  private val Span = 30L * 60L * 1000000L

  private def run(rows: Seq[(Long, Long, String)],
                  spanUs: Long = Span): Seq[(Long, Long, Long, Long)] = {
    // (user, tsUs, type); tie = a synthetic increasing id
    val df = rows.zipWithIndex
      .map { case ((u, t, ty), i) => (u, t, i.toLong, ty) }
      .toDF("user_id", "t", "event_id", "event_type")
      .repartition(5) // scrambled input — the op must impose its own order
    Cep.funnelMatches(df, "user_id", col("t"), col("event_id"),
        col("event_type"), "view", "click", "purchase", spanUs)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
  }

  test("kleene run: view click click purchase matches with n_mid = 2") {
    assert(run(Seq((1L, 10L, "view"), (1L, 20L, "click"),
      (1L, 30L, "click"), (1L, 40L, "purchase"))) ===
      Seq((1L, 10L, 40L, 2L)))
  }

  test("zero-click match: view purchase") {
    assert(run(Seq((1L, 10L, "view"), (1L, 40L, "purchase"))) ===
      Seq((1L, 10L, 40L, 0L)))
  }

  test("an intervening other-type event breaks the run") {
    assert(run(Seq((1L, 10L, "view"), (1L, 20L, "click"),
      (1L, 30L, "error"), (1L, 40L, "purchase"))) === Seq.empty)
  }

  test("restarted start: the innermost view wins") {
    assert(run(Seq((1L, 10L, "view"), (1L, 15L, "view"),
      (1L, 20L, "click"), (1L, 40L, "purchase"))) ===
      Seq((1L, 15L, 40L, 1L)))
  }

  test("no overlap: a second purchase after a match finds no open run") {
    assert(run(Seq((1L, 10L, "view"), (1L, 20L, "click"),
      (1L, 30L, "purchase"), (1L, 35L, "purchase"))) ===
      Seq((1L, 10L, 30L, 1L)))
  }

  private def runQ(rows: Seq[(Long, Long, String)], minMid: Long,
                   maxMid: Long, greedy: Boolean = false,
                   mids: Set[String] = Set("click"),
                   end: String = "purchase")
      : Seq[(Long, Long, Long, Long)] = {
    val df = rows.zipWithIndex
      .map { case ((u, t, ty), i) => (u, t, i.toLong, ty) }
      .toDF("user_id", "t", "event_id", "event_type")
      .repartition(5)
    Cep.funnelMatchesQuant(df, "user_id", col("t"), col("event_id"),
        col("event_type"), "view", mids, end, minMid, maxMid, Span,
        greedyOverlap = greedy)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
  }

  test("quantifier {1,2}: counts in bounds match, 0 and 3 don't") {
    def clicks(n: Int): Seq[(Long, Long, String)] =
      (1L, 10L, "view") +: (1 to n).map(i => (1L, 10L + i, "click")) :+
        (1L, 100L, "purchase")
    assert(runQ(clicks(0), 1L, 2L) === Seq.empty)
    assert(runQ(clicks(1), 1L, 2L) === Seq((1L, 10L, 100L, 1L)))
    assert(runQ(clicks(2), 1L, 2L) === Seq((1L, 10L, 100L, 2L)))
    // the third click kills the run in place — and the dead run stays
    // dead: the purchase can't close it
    assert(runQ(clicks(3), 1L, 2L) === Seq.empty)
  }

  test("quantifier: a fresh start after a cap-killed run matches again") {
    val got = runQ(Seq((1L, 10L, "view"), (1L, 11L, "click"),
      (1L, 12L, "click"), (1L, 13L, "click"), // cap {_,2} exceeded
      (1L, 20L, "view"), (1L, 21L, "click"), (1L, 30L, "purchase")),
      minMid = 1L, maxMid = 2L)
    assert(got === Seq((1L, 20L, 30L, 1L)))
  }

  test("quantifier: an under-minimum end consumes the run (skip past)") {
    // purchase at 20 sees 0 < minMid clicks: no match AND the run is
    // consumed — the later purchase has no open run either
    val got = runQ(Seq((1L, 10L, "view"), (1L, 20L, "purchase"),
      (1L, 21L, "click"), (1L, 30L, "purchase")), 1L, 2L)
    assert(got === Seq.empty)
  }

  test("overlap policy: reluctant closes at the minimum, greedy at the cap") {
    // end type ∈ mid set: view p p p p with pattern view (purchase){1,3} purchase
    val rows = Seq((1L, 10L, "view"), (1L, 20L, "purchase"),
      (1L, 30L, "purchase"), (1L, 40L, "purchase"), (1L, 50L, "purchase"))
    val reluctant = runQ(rows, 1L, 3L, greedy = false,
      mids = Set("purchase"))
    // first purchase extends (under the minimum), second closes: n_mid 1
    assert(reluctant === Seq((1L, 10L, 30L, 1L)))
    val greedy = runQ(rows, 1L, 3L, greedy = true, mids = Set("purchase"))
    // three extensions to the cap, the fourth closes: n_mid 3
    assert(greedy === Seq((1L, 10L, 50L, 3L)))
  }

  test("quantifier {0,∞} ≡ the unquantified matcher on real-shaped runs") {
    val rnd = new scala.util.Random(11)
    val types = Array("view", "click", "purchase", "error")
    val rows = (1 to 400).map(i =>
      ((i % 7).toLong, i.toLong * 10L, types(rnd.nextInt(4))))
    val plain = run(rows)
    val quant = runQ(rows.map { case (u, t, ty) => (u, t, ty) },
      0L, Long.MaxValue)
    assert(quant === plain)
  }

  test("null timestamp/tie events are excluded, not an NPE") {
    // a null-time click inside the run carries no ordering information:
    // it is dropped up front, so the surviving contiguous run still
    // matches (and the scan does not crash on the null)
    val df = Seq(
      (1L, Some(10L), Some(0L), "view"),
      (1L, Option.empty[Long], Some(1L), "click"),
      (1L, Some(20L), Option.empty[Long], "click"),
      (1L, Some(30L), Some(3L), "purchase"))
      .toDF("user_id", "t", "event_id", "event_type")
    val got = Cep.funnelMatches(df, "user_id", col("t"), col("event_id"),
        col("event_type"), "view", "click", "purchase", Span)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 10L, 30L, 0L)))
  }

  test("purchase without a view never matches") {
    assert(run(Seq((1L, 20L, "click"), (1L, 30L, "purchase"))) ===
      Seq.empty)
  }

  test("span bound: a structurally valid run over maxSpanUs is dropped") {
    assert(run(Seq((1L, 10L, "view"), (1L, 20L, "click"),
      (1L, 10L + Span + 1L, "purchase"))) === Seq.empty)
    assert(run(Seq((1L, 10L, "view"), (1L, 10L + Span, "purchase"))) ===
      Seq((1L, 10L, 10L + Span, 0L)))
  }

  test("alternation: the Kleene segment accepts any mid type") {
    def runAlt(rows: Seq[(Long, Long, String)]) = {
      val df = rows.zipWithIndex
        .map { case ((u, t, ty), i) => (u, t, i.toLong, ty) }
        .toDF("user_id", "t", "event_id", "event_type")
      Cep.funnelMatches(df, "user_id", col("t"), col("event_id"),
          col("event_type"), "signup", Set("view", "click"), "purchase",
          Span)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    }
    // mixed view/click run counts as one segment of 3
    assert(runAlt(Seq((1L, 10L, "signup"), (1L, 20L, "view"),
      (1L, 25L, "click"), (1L, 28L, "view"), (1L, 40L, "purchase"))) ===
      Seq((1L, 10L, 40L, 3L)))
    // a non-mid type still breaks the run
    assert(runAlt(Seq((1L, 10L, "signup"), (1L, 20L, "view"),
      (1L, 30L, "error"), (1L, 40L, "purchase"))) === Seq.empty)
  }

  test("adjacent matches both emit; streams never leak across keys") {
    assert(run(Seq((1L, 10L, "view"), (1L, 20L, "purchase"),
      (1L, 30L, "view"), (1L, 40L, "purchase"),
      // user 2's view must not complete user 1's stream
      (2L, 50L, "purchase"))) ===
      Seq((1L, 10L, 20L, 0L), (1L, 30L, 40L, 0L)))
  }

  /** Independent declarative twin (the q165 oracle's plan, in Spark):
    * per purchase row, the maximal click-run ending immediately before
    * it, with the row before that run a view. */
  private def declarativeTwin(events: DataFrame): Seq[(Long, Long, Long, Long)] = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val e = events
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(byUser))
    val g = e.withColumn("grp", col("rn") - row_number().over(
      Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("rn"))))
    val cr = g.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("grp"))
      .agg(max(col("rn")).as("rn_hi"), count(lit(1)).as("len"))
    val p = e.filter(col("event_type") === "purchase")
      .join(cr.withColumnRenamed("user_id", "u2"),
        col("u2") === col("user_id") && col("rn_hi") === col("rn") - 1,
        "left_outer")
      .select(col("user_id"), col("rn"), col("t").as("end_us"),
        coalesce(col("len"), lit(0L)).as("n_clicks"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("rn").as("vrn"),
        col("t").as("start_us"))
    p.join(v, col("vu") === col("user_id") &&
        col("vrn") === col("rn") - 1 - col("n_clicks"))
      .filter(col("end_us") - col("start_us") <= Span)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_clicks"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
  }

  test("matcher ≡ declarative window twin on the sf0.001 events table") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val got = Cep.funnelMatches(events, "user_id",
        unix_micros(col("ts")), col("event_id"), col("event_type"),
        "view", "click", "purchase", Span)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val want = declarativeTwin(events)
    assert(want.nonEmpty, "fixture should produce at least one match")
    assert(got === want)
  }
}
