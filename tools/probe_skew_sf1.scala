// Probe (round 11, verdict item 8b): where is the salt advisor's decision
// MEASURABLE against the unsalted plan at sf1wh (10x events: 1M rows,
// ~15k users)? Two regimes, both with AQE ON (the engine default):
//
//  A. INPUT-skew enrich join — q220's shape: ~50% of probe rows on one
//     key, fan-out ~67 (per-user history). AQE's skew-join sees the
//     oversized probe partition and splits it; expectation: unsalted
//     wins, the advisor's salting is overhead here.
//  B. OUTPUT-amplification pair join — ~1% of rows on the hot key on
//     BOTH sides (10k x 10k = 100M pairs on one reducer), every shuffle
//     block small so AQE is blind; expectation: advised wins.
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Skew

{
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)

  val dir = sys.env.getOrElse("SKEW_SF_DIR", "/tmp/sf1wh")
  val ev = Tables.events(spark, dir)

  def time(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)), sum(col("value") * col("w"))).collect().head
      ((System.nanoTime() - t0) / 1e9, r.getLong(0))
    }
    (runs.map(_._1).min, runs.head._2)
  }

  // ---- regime A: input skew (q220 shape), AQE-visible
  val leftA = ev.select(col("event_type"), col("value"),
    when(col("event_id") % 2 === 0, lit(0L)).otherwise(col("user_id"))
      .as("skew_uid"))
  val rightA = ev.select(col("user_id").as("h_uid"), col("value").as("w"))
  val vA = Skew.skewAdvisor(leftA, "skew_uid", hotFactor = 4L)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  println(s"[probe] A verdicts (key,freq,buckets): ${vA.mkString(", ")}")
  val (aPlainSec, aPlainRows) =
    time(leftA.join(rightA, col("skew_uid") === col("h_uid"), "inner"))
  val (aAdvSec, aAdvRows) =
    time(Skew.advisedJoin(leftA, rightA, "skew_uid", "h_uid", hotFactor = 4L))
  assert(aAdvRows == aPlainRows)
  println(f"[probe] A input-skew:  unsalted $aPlainSec%.2f s vs advised $aAdvSec%.2f s (${aPlainSec/aAdvSec}%.2fx) over $aPlainRows%d rows")

  // ---- regime B: output amplification (pair join), AQE-blind
  // 4% of rows on the hot key on both sides -> 40k x 40k = 1.6G pairs on
  // ONE reducer (vs ~4.4k per tolerable key): the shuffle blocks feeding
  // the join are all small, so AQE's size-based skew split never fires
  val keyB = when(col("event_id") % 25 === 0, lit(0L)).otherwise(col("user_id"))
  val leftB = ev.select(col("value"), keyB.as("skew_uid"))
  val rightB = ev.select(keyB.as("h_uid"), col("value").as("w"))
  val vB = Skew.skewAdvisor(leftB, "skew_uid", hotFactor = 4L)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  println(s"[probe] B verdicts (key,freq,buckets): ${vB.mkString(", ")}")
  val (bPlainSec, bPlainRows) =
    time(leftB.join(rightB, col("skew_uid") === col("h_uid"), "inner"))
  val (bAdvSec, bAdvRows) =
    time(Skew.advisedJoin(leftB, rightB, "skew_uid", "h_uid", hotFactor = 4L))
  assert(bAdvRows == bPlainRows, s"$bAdvRows vs $bPlainRows")
  println(f"[probe] B amplification: unsalted $bPlainSec%.2f s vs advised $bAdvSec%.2f s (${bPlainSec/bAdvSec}%.2fx) over $bPlainRows%d rows")
  println("[probe] done")
}
System.exit(0)
