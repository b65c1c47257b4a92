package graft

import org.apache.spark.sql.functions._

import graft.ops.{DataQuality, Trend, ZoneMap}

/** The statistical-monitoring ops behind q144-q148: OLS slope sign on
  * hand-built series, CUSUM changepoint on a step series, calendar-lag
  * autocovariance (gaps pair with NOTHING — the property a positional
  * LEAD gets wrong), zone-map stats + skip-audit contrapositive, and
  * the Benford profile's digit/share arithmetic. */
class MonitorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def series(rows: (String, Long, Long)*) =
    rows.toDF("k", "x", "y")

  test("olsSlope: rising, falling and flat series get the right verdict") {
    val daily = series(
      ("up", 10L, 1L), ("up", 11L, 2L), ("up", 12L, 3L),
      ("down", 10L, 9L), ("down", 11L, 5L), ("down", 12L, 1L),
      ("flat", 10L, 4L), ("flat", 11L, 4L), ("flat", 12L, 4L))
    val got = Trend.olsSlope(daily, "k").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // n=3, x={10,11,12}: den = 3*365 - 33² = 6 for every key
    assert(got("up") === ((6L, 6L, "up")))     // slope exactly +1
    assert(got("down") === ((-24L, 6L, "down"))) // slope exactly -4
    assert(got("flat") === ((0L, 6L, "flat")))
  }

  test("cusumChangepoint finds the step, ties to the earliest day") {
    // 2,2,2,8,8: mean 4.4; the cumulative centered sum peaks right
    // before the step (after day 3), so cp_day = the last pre-step day
    val daily = series(
      ("s", 1L, 2L), ("s", 2L, 2L), ("s", 3L, 2L),
      ("s", 4L, 8L), ("s", 5L, 8L))
    val r = Trend.cusumChangepoint(daily, "k").collect().head
    assert((r.getLong(1), r.getLong(2)) === ((5L, 22L)))
    // scaled cum at day i: sum of (5*y - 22); days 1..3 each -12 → min -36
    assert((r.getLong(3), r.getLong(4)) === ((3L, 36L)))
  }

  test("lagAutocov pairs by CALENDAR day: gaps pair with nothing") {
    // days 1,2,4 — lag 1 pairs (1,2) only; a positional LEAD would
    // also (wrongly) pair (2,4)
    val daily = Seq((1L, 10L), (2L, 20L), (4L, 40L)).toDF("x", "y")
    val got = Trend.lagAutocov(daily, Seq(1))
      .select("n_pairs", "s1", "s2", "s12").as[(Long, Long, Long, Long)]
      .collect().head
    assert(got === ((1L, 10L, 20L, 200L)))
  }

  test("lagAutocov autocov_num sign matches the series' autocorrelation") {
    // strictly increasing series → positive lag-1 autocovariance
    val daily = (1L to 8L).map(x => (x, x * x)).toDF("x", "y")
    val r = Trend.lagAutocov(daily, Seq(1)).collect().head
    assert(r.getAs[Long]("n_pairs") === 7L)
    assert(r.getAs[Long]("autocov_num") > 0L)
  }

  test("zoneStats + skipAudit: stats are exact, skippable is the " +
    "contrapositive of mustScan") {
    val df = Seq((1L, 5L, 100L), (1L, 9L, 200L), (2L, 50L, 10L))
      .toDF("zone_in", "d1", "d2")
    val stats = ZoneMap.zoneStats(df, col("zone_in"),
      Seq("d1" -> col("d1"), "d2" -> col("d2")))
    val audit = ZoneMap.skipAudit(stats,
        col("max_d1") >= 40L && col("min_d1") <= 60L)
      .orderBy("zone")
      .select("zone", "min_d1", "max_d1", "n_rows", "skippable")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(audit === Array(
      (1L, 5L, 9L, 2L, true),   // max_d1=9 < 40 → provably no match
      (2L, 50L, 50L, 1L, false)))
  }

  test("benfordProfile: fixed-point digit extraction + integer bp shares") {
    // 1.00→digit 1, 19.99→1, 2.50→2, 0.004→0 cents → dropped, 900→9
    val df = Seq(1.00, 19.99, 2.50, 0.004, 900.0).toDF("amt")
    val got = DataQuality.benfordProfile(df, col("amt"))
      .orderBy("digit").as[(Int, Long, Long)].collect()
    assert(got === Array((1, 2L, 5000L), (2, 1L, 2500L), (9, 1L, 2500L)))
  }

  test("benfordProfile share_bp sums to ≤ 10000 (integer division)") {
    val df = Seq(1.0, 2.0, 3.0).toDF("amt") // 3 digits, 3333 bp each
    val shares = DataQuality.benfordProfile(df, col("amt"))
      .agg(sum("share_bp")).as[Long].collect().head
    assert(shares === 9999L)
  }
}
