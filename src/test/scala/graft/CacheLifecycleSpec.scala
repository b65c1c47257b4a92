package graft

import org.apache.spark.sql.DataFrame

import graft.ops.{Curation, Dedup}

/** CacheScope contract (r2 VERDICT #2): operators stage intermediates
  * internally and leak nothing — after consuming and unpersisting the
  * returned (pinned) result, the block manager holds exactly what it held
  * before the call. */
class CacheLifecycleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)

  test("pair/curation operators leave no cached RDDs behind") {
    val cases: Seq[(String, () => DataFrame)] = Seq(
      ("minhashLshPairs",
        () => Dedup.minhashLshPairs(docs, "doc_id", "text", n = 2, threshold = 0.5)),
      ("simhashPairs",
        () => Dedup.simhashPairs(docs, "doc_id", "text")),
      ("simhashVerifiedPairs",
        () => Dedup.simhashVerifiedPairs(docs, "doc_id", "text")),
      ("curate",
        () => Curation.curate(docs, "doc_id", "text")))
    for ((name, build) <- cases) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val res = build()
      res.count() // consume like a caller would
      res.unpersist(blocking = true)
      val after = spark.sparkContext.getPersistentRDDs.keySet
      assert((after -- before).isEmpty,
        s"$name leaked cached RDDs: ids ${(after -- before).toSeq.sorted}")
    }
  }

  test("q33's fixture staging releases its popularity cache") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = graft.queries.DomainQueries.q33CountHighlights(spark, dir)
    res.count()
    res.unpersist(blocking = true)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty)
  }
}
