package graft

import graft.jobs.TrendsMain

/** CLI surface: flag parsing and an end-to-end parquet-dir run. */
class TrendsMainSpec extends SparkSpec {

  test("flag parsing mirrors the reference's flag surface") {
    val p = TrendsMain.paramsFrom(TrendsMain.parseArgs(Array(
      "--since-date=2023-03-10", "--publishers-list-id=LIST",
      "--limit=5", "--page=2", "--since-last-week")))
    assert(p.sinceDate === "2023-03-10")
    assert(p.listId === "LIST")
    assert(p.limit === 5 && p.page === 2)
    assert(p.sinceLastWeek)
    intercept[RuntimeException](
      TrendsMain.paramsFrom(TrendsMain.parseArgs(Array.empty)))
  }

  test("parquet-dir run: three passes land in the partitioned sink") {
    val dir = java.nio.file.Files.createTempDirectory("trends-tables").toString
    val out = java.nio.file.Files.createTempDirectory("trends-sink").toString
    val t = FixtureData.tables(spark)
    t.weavingStatus.write.parquet(s"$dir/weaving_status.parquet")
    t.highlight.write.parquet(s"$dir/highlight.parquet")
    t.publishersList.write.parquet(s"$dir/publishers_list.parquet")
    t.statusPopularity.write.parquet(s"$dir/status_popularity.parquet")
    t.weavingUser.write.parquet(s"$dir/weaving_user.parquet")
    TrendsMain.run(spark, TrendsMain.parseArgs(Array(
      s"--since-date=${FixtureData.D}", "--publishers-list-id=LIST",
      s"--tables-dir=$dir", s"--sink-path=$out/docs", "--limit=-1",
      "--in-parallel=false")))
    val docs = spark.read.parquet(s"$out/docs")
    assert(docs.count() > 0)
    assert(docs.select("status_type").distinct().collect()
      .map(_.getString(0)).toSet ===
      Set("status", "retweetFromDistinctSources", "statusFromDistinctSources"))
    // distinct-sources-only mode writes just pass 3
    TrendsMain.run(spark, TrendsMain.parseArgs(Array(
      s"--since-date=${FixtureData.D}", "--publishers-list-id=LIST",
      s"--tables-dir=$dir", s"--sink-path=$out/docs3", "--limit=-1",
      "--migrate-distinct-sources-only")))
    assert(spark.read.parquet(s"$out/docs3").select("status_type").distinct()
      .collect().map(_.getString(0)).toSet === Set("statusFromDistinctSources"))
  }
}
