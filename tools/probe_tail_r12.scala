// Round-12 fat-tail root-cause probe (r12 verdict item 4): for each of
// q54/q97/q126/q159 measure wall seconds AND the work/output quantity
// that drives it, at sf0.1 and 10x docs — evidence for the per-query
// cause lines in SCALING_r12.
import org.apache.spark.sql.functions._
import graft.Tables
{
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[tail] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  n=$n%d")
  }
  for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1docs")) {
    println(s"[tail] ==== $dir")
    val docs = Tables.documents(spark, dir)
    // q54 work driver: distinct trigram OCCURRENCES (the explode+shuffle mass)
    val toks = filter(split(lower(col("text")), "[^a-z]+"), x => length(x) > 0)
    val tri = when(size(toks) >= 3, transform(sequence(lit(1), size(toks) - 2), i => concat_ws(" ", slice(toks, i, lit(3))))).otherwise(array().cast("array<string>"))
    t("q54 occurrences")(docs.select(explode(array_distinct(tri)).as("p")).count())
    t("q54 wall+rows")(graft.queries.TextPipelineQueries.q54Boilerplate(spark, dir).count())
    // q97 output mass (exact joins: output rows ARE the verified pair mass)
    t("q97 wall+rows")(graft.queries.WarehouseQueries.q97SetSimJoin(spark, dir).count())
    // q126: first call pays the PairStore build, second reads the memo
    t("q126 cold (store build)")(graft.queries.CurationQueries.q126CrossSourceDupMatrix(spark, dir).count())
    t("q126 warm (memo read)")(graft.queries.CurationQueries.q126CrossSourceDupMatrix(spark, dir).count())
    t("q126 pair-table rows")(graft.queries.PairStore.nearDupPairs(spark, dir).count())
    // q159: model size (broadcast build mass) + scored bigram occurrences
    t("q159 model bigrams")(graft.ops.NgramLm.kneserNeyBigrams(docs.filter(col("source") =!= "src0"), "text").count())
    t("q159 wall+rows")(graft.queries.MonitorQueries.q159LmScore(spark, dir).count())
    // q223 replaces q125 on the sweep; q125 full stays sf0.1-only
    t("q223 wall+rows")(graft.queries.CurationQueries.q223ContainmentSample(spark, dir).count())
  }
  t("q125 FULL sf0.1 only")(graft.queries.CurationQueries.q125ContainmentPairs(spark, "/root/testdata/sf0.1").count())
}
