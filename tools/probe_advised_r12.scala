// Round-12 advisor on-vs-off probe (r12 verdict item 5): q108/q202's
// blocking joins through Skew.advisedJoin vs the plain equi join, at
// sf0.1 and 10x warehouse. "off" rebuilds the r11 form (plain USING
// join / conjunction passes); "on" is the shipped query path.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.Tables
import graft.ops.{RecordLinkage, StringSim}
{
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  graft.functions.GraftFunctions.register(spark)
  def t(name: String)(f: => Long): Unit = {
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"[adv] $name%-26s ${times.map(_._1).min}%8.2f s  n=${times.head._2}%d")
  }
  for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1wh")) {
    println(s"[adv] ==== $dir")
    val parts = Tables.part(spark, dir).select(col("p_partkey"), col("p_name"))
    // explicit Some(16L): round 13 flipped the parameter's DEFAULT (and
    // fronted it with the maybeHot pre-verdict), so reproducing the r12
    // always-advised row requires naming the factor (advice item r13)
    t("q108 pairs advised ON")(StringSim.editDistanceNamePairs(parts, "p_partkey", "p_name", 2, advisorHotFactor = Some(16L)).count())
    t("q108 pairs advisor OFF")(StringSim.editDistanceNamePairs(parts, "p_partkey", "p_name", 2, advisorHotFactor = None).count())
    val c = Tables.customer(spark, dir)
    val a = c.select(col("c_custkey").as("id_a"), col("c_name").as("name_a"), col("c_nationkey").as("nk_a"), col("c_mktsegment").as("seg_a"), floor(col("c_acctbal") / 100.0).cast("long").as("band_a"))
    val b = c.select((col("c_custkey") + 1000000L).as("id_b"), when(expr("c_custkey % 7 = 0"), translate(col("c_name"), "012", "OIZ")).otherwise(col("c_name")).as("name_b"), col("c_nationkey").as("nk_b"), when(expr("c_custkey % 5 = 0"), lit("UNKNOWN")).otherwise(col("c_mktsegment")).as("seg_b"), (floor(col("c_acctbal") / 100.0).cast("long") + when(expr("c_custkey % 3 = 0"), 1L).otherwise(0L)).as("band_b"))
    val rules = Seq(RecordLinkage.FieldRule("name", expr("jaro_winkler(reverse(name_a), reverse(name_b)) >= 0.95"), 40, 30), RecordLinkage.FieldRule("segment", col("seg_a") === col("seg_b"), 15, 10), RecordLinkage.FieldRule("band", col("band_a") === col("band_b"), 25, 20))
    t("q202 link advised ON")(RecordLinkage.linkPassesAdvised(a, b, Seq(struct(col("nk_a"), substring(reverse(col("name_a")), 1, 8)) -> struct(col("nk_b"), substring(reverse(col("name_b")), 1, 8)), struct(col("nk_a"), col("band_a"), col("seg_a")) -> struct(col("nk_b"), col("band_b"), col("seg_b"))), Seq("id_a", "id_b"), rules, 50, 25).count())
    t("q202 link advisor OFF")(RecordLinkage.linkPasses(a, b, Seq(col("nk_a") === col("nk_b") && substring(reverse(col("name_a")), 1, 8) === substring(reverse(col("name_b")), 1, 8), col("nk_a") === col("nk_b") && col("band_a") === col("band_b") && col("seg_a") === col("seg_b")), Seq("id_a", "id_b"), rules, 50, 25).count())
  }
}
