// Crossover probe for TwoPhaseScan.cumSums (round 14, verdict item 1):
// at sf0.1 the converted q143/q176 inputs are a few thousand distinct
// values, so the two-phase plan's extra stages COST ~0.3-0.5 s (measured,
// OPTIMIZATION_r14.md). This probe measures the regime the conversion is
// FOR: a ~continuous value domain (one distinct value per row), where the
// old `sum OVER (ORDER BY v)` window serializes the whole CDF table
// through one task. Spark shape only -- results of the two shapes are
// asserted equal first.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path target/scala-2.13/classes \
//   --conf spark.ui.enabled=false --conf spark.sql.extensions=graft.functions.GraftExtensions \
//   -i tools/probe_cumsum_scale.scala
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
{
  spark.sparkContext.setLogLevel("ERROR")
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  def t[A](name: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r }
  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  // synthetic two-cohort frame with a ~continuous value: n rows, every
  // value distinct (xxhash64 of the id), cohorts split by id parity --
  // the exact shape Drift.ksDrift sees on a continuous numeric column
  def cohorts(n: Long) = spark.range(n).select(
    concat(lit("src"), (col("id") % 2).cast("string")).as("g"),
    xxhash64(col("id")).as("v"))

  // the ROUND-13 shape, inlined: counts -> single-partition ORDER BY
  // window + totals branch (verbatim from Drift.ksDrift @ efbb6f4)
  def ksOld(df: org.apache.spark.sql.DataFrame) = {
    val d = df.filter(col("g").isin("src0", "src1") && col("v").isNotNull)
      .select(col("g"), col("v"))
    val counts = d.groupBy(col("v"))
      .agg(sum(when(col("g") === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === "src1", 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("f1", sum(col("c1")).over(w))
      .withColumn("f2", sum(col("c2")).over(w))
    val totals = counts.agg(sum(col("c1")).cast("long").as("n1"),
      sum(col("c2")).cast("long").as("n2"))
    val dec = "decimal(38,0)"
    cum.crossJoin(broadcast(totals))
      .select(col("n1"), col("n2"),
        abs(col("f1").cast(dec) * col("n2") -
          col("f2").cast(dec) * col("n1")).as("gap"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("gap")).cast(dec).as("ks_scaled_d"))
      .select(col("n1"), col("n2"),
        col("ks_scaled_d").cast("string").as("ks_scaled"),
        (col("ks_scaled_d").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double"))).as("ks"))
  }
  def ksNew(df: org.apache.spark.sql.DataFrame) =
    graft.ops.Drift.ksDrift(df, "g", "v", "src0", "src1")

  // equality first (1M rows): same single output row
  val eqDf = cohorts(1000000L)
  val a = ksOld(eqDf).collect().map(_.toString).toSeq
  val b = ksNew(eqDf).collect().map(_.toString).toSeq
  println("RESULTS EQUAL (1M distinct values): " + (a == b) + "  " + a.mkString)

  // 20M was tried too but OOMs the default 1g shell heap during warmup
  // (both shapes; environmental, not a shape result) -- the 1M/5M pair
  // already brackets the crossover. Measured 2026-08-19 on this box:
  //   n=1M: OLD 1.68-1.86 s, NEW 1.79-2.70 s  (parity)
  //   n=5M: OLD 10.28-12.89 s, NEW 4.18-5.49 s (two-phase 2.5x faster,
  //         and the gap is the single sort task -- it widens with n)
  for (n <- Seq(1000000L, 5000000L)) {
    val df = cohorts(n)
    noop(ksNew(df)); noop(ksOld(df)) // JIT/codegen warm per size
    t(s"OLD single-partition window, n=$n") { noop(ksOld(df)) }
    t(s"OLD single-partition window, n=$n (p2)") { noop(ksOld(df)) }
    t(s"NEW TwoPhaseScan.cumSums,    n=$n") { noop(ksNew(df)) }
    t(s"NEW TwoPhaseScan.cumSums,    n=$n (p2)") { noop(ksNew(df)) }
  }
}
System.exit(0)
