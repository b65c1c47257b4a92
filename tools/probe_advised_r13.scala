// Round-13 pre-verdict acceptance probe (r12 verdict item 2): the skew
// advisor fronted by Skew.maybeHot must be ~free on q108/q202's flat
// blocking keys (target: within ~1.1x of the plain join, where the r12
// always-exact advisor cost 1.6-3.0x) while the hot q220 shape still
// takes the salted plan. Rows: ON = the shipped default (advised, sketch
// pre-verdict); FORCED = preVerdict bypassed (the r12 always-advised
// plan); OFF = plain joins (the r12 shipped form).
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{RecordLinkage, Skew, StringSim}
{
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  graft.functions.GraftFunctions.register(spark)
  def t(name: String)(f: => Long): Unit = {
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"[adv13] $name%-28s ${times.map(_._1).min}%8.2f s  n=${times.head._2}%d")
  }
  for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1wh")) {
    println(s"[adv13] ==== $dir")
    val parts = Tables.part(spark, dir).select(col("p_partkey"), col("p_name"))
    t("q108 pairs ON (pre-verdict)")(StringSim.editDistanceNamePairs(parts, "p_partkey", "p_name", 2, advisorHotFactor = Some(16L)).count())
    t("q108 pairs OFF (plain)")(StringSim.editDistanceNamePairs(parts, "p_partkey", "p_name", 2, advisorHotFactor = None).count())
    val c = Tables.customer(spark, dir)
    val a = c.select(col("c_custkey").as("id_a"), col("c_name").as("name_a"), col("c_nationkey").as("nk_a"), col("c_mktsegment").as("seg_a"), floor(col("c_acctbal") / 100.0).cast("long").as("band_a"))
    val b = c.select((col("c_custkey") + 1000000L).as("id_b"), when(expr("c_custkey % 7 = 0"), translate(col("c_name"), "012", "OIZ")).otherwise(col("c_name")).as("name_b"), col("c_nationkey").as("nk_b"), when(expr("c_custkey % 5 = 0"), lit("UNKNOWN")).otherwise(col("c_mktsegment")).as("seg_b"), (floor(col("c_acctbal") / 100.0).cast("long") + when(expr("c_custkey % 3 = 0"), 1L).otherwise(0L)).as("band_b"))
    val rules = Seq(RecordLinkage.FieldRule("name", expr("jaro_winkler(reverse(name_a), reverse(name_b)) >= 0.95"), 40, 30), RecordLinkage.FieldRule("segment", col("seg_a") === col("seg_b"), 15, 10), RecordLinkage.FieldRule("band", col("band_a") === col("band_b"), 25, 20))
    val passKeys = Seq(struct(col("nk_a"), substring(reverse(col("name_a")), 1, 8)) -> struct(col("nk_b"), substring(reverse(col("name_b")), 1, 8)), struct(col("nk_a"), col("band_a"), col("seg_a")) -> struct(col("nk_b"), col("band_b"), col("seg_b")))
    t("q202 link ON (pre-verdict)")(RecordLinkage.linkPassesAdvised(a, b, passKeys, Seq("id_a", "id_b"), rules, 50, 25).count())
    t("q202 link OFF (plain)")(RecordLinkage.linkPasses(a, b, Seq(col("nk_a") === col("nk_b") && substring(reverse(col("name_a")), 1, 8) === substring(reverse(col("name_b")), 1, 8), col("nk_a") === col("nk_b") && col("band_a") === col("band_b") && col("seg_a") === col("seg_b")), Seq("id_a", "id_b"), rules, 50, 25).count())
    // hot shape (q220's construction): the pre-verdict must keep the salted plan winning
    val ev = Tables.events(spark, dir)
    val left = ev.select(col("event_type"), col("value"), when(col("event_id") % 2 === 0, lit(0L)).otherwise(col("user_id")).as("skew_uid"))
    val profile = ev.groupBy(col("user_id")).agg(count(lit(1)).as("user_events"))
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcKey)
    spark.conf.set(bcKey, "-1")
    t("q220 hot advised ON")(Skew.advisedJoin(left, profile, "skew_uid", "user_id", 4L).agg(count(lit(1))).collect().head.getLong(0))
    t("q220 hot plain join")(left.join(profile, col("skew_uid") === col("user_id")).agg(count(lit(1))).collect().head.getLong(0))
    spark.conf.set(bcKey, prev)
  }
}
