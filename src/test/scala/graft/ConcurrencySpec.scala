package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ops.{Curation, Dedup}

/** Multi-query sessions: CacheScope operators running CONCURRENTLY in one
  * SparkSession must neither corrupt each other's results nor leak caches.
  * The sharpest edge is exercised deliberately: q26's and q27's pipelines
  * stage the IDENTICAL hashedShingleSets plan, which Spark's CacheManager
  * dedups to one entry — the first scope to finish releases it while the
  * other may still be mid-flight, whose lineage then recomputes (slower,
  * never wrong) and whose own release becomes a no-op. */
class ConcurrencySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)

  private def collectAndRelease(df: DataFrame): Seq[String] = {
    val out = df.orderBy(df.columns.map(col).toSeq: _*)
      .collect().map(_.toString).toSeq
    df.unpersist(blocking = true)
    out
  }

  test("concurrent LSH/simhash/curation match their sequential results, no leaks") {
    def run26() = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 2, threshold = 0.5)
    def run27() = Dedup.simhashVerifiedPairs(docs, "doc_id", "text")
    def run37() = Curation.curate(docs, "doc_id", "text")

    val seq26 = collectAndRelease(run26())
    val seq27 = collectAndRelease(run27())
    val seq37 = collectAndRelease(run37())

    val before = spark.sparkContext.getPersistentRDDs.keySet
    val t0 = System.nanoTime()
    val results = Await.result(
      Future.sequence(Seq(
        Future(collectAndRelease(run26())),
        Future(collectAndRelease(run27())),
        Future(collectAndRelease(run37())))),
      20.minutes) // generous: under a fully parallel suite the three
                  // pipelines contend for all cores and 5 min has flaked
    // the generous timeout can mask a large regression — surface the
    // actual wall time so a slowdown is visible in the test log even
    // when the suite still passes
    val elapsed = (System.nanoTime() - t0) / 1e9
    info(f"concurrent q26+q27+q37 wall time: $elapsed%.1f s")
    if (elapsed > 300)
      info(s"WARNING: concurrent pipelines took ${elapsed.toInt} s — " +
        "5x the historical idle-host time; investigate before raising the timeout again")
    assert(results(0) === seq26, "q26 under concurrency")
    assert(results(1) === seq27, "q27 under concurrency")
    assert(results(2) === seq37, "q37 under concurrency")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"concurrent scopes leaked cached RDDs: $leaked")
  }
}
