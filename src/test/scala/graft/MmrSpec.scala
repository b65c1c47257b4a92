package graft

import graft.ops.Mmr

/** MMR's contract: pick 1 is pure argmax-relevance; later picks trade
  * relevance against max-similarity-to-selected. The spec builds vectors
  * where the two orderings disagree, so a wrong penalty (or a stale
  * candidate filter) flips a pick, and locks the reference greedy
  * computed in-process. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def embDf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("first pick is the most relevant candidate; ranks are 1..k") {
    val df = embDf(
      0L -> Seq(1f, 0f),   // query
      1L -> Seq(1f, 0.1f), // most relevant
      2L -> Seq(0.9f, 0.2f),
      3L -> Seq(0f, 1f))
    val out = Mmr.mmrTopK(df, "vec_id", "embedding", 0L, 3, 0.7, 0.3, 10)
      .orderBy("rank").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(out.head.getLong(1) === 1L)
  }

  test("diversity penalty demotes an exact clone of the first pick") {
    // 2 is an exact clone of 1; with penalty outweighing relevance the
    // orthogonal 3 (rel 0, penalty 0, score 0) beats the clone (score
    // 0.4 - 0.6 = -0.2). Pure-relevance ranking would return (1, 2).
    val df = embDf(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0f),
      2L -> Seq(1f, 0f),
      3L -> Seq(0f, 1f))
    val picks = Mmr.mmrTopK(df, "vec_id", "embedding", 0L, 2, 0.4, 0.6, 10)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(picks === Seq(1L, 3L))
  }

  test("matches an in-process greedy reference on a random corpus") {
    val rnd = new scala.util.Random(11)
    val rows = (0L to 20L).map(id =>
      id -> Seq.fill(4)(rnd.nextFloat()))
    val df = embDf(rows: _*)
    val got = Mmr.mmrTopK(df, "vec_id", "embedding", 0L, 5, 0.7, 0.3, 12)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq

    // reference greedy (same candidate prune, same tie-break by id)
    val q = rows.head._2.map(_.toDouble)
    val cands0 = rows.tail
      .map { case (id, v) => (id, v.map(_.toDouble), cos(v.map(_.toDouble), q)) }
      .sortBy { case (id, _, rel) => (-rel, id) }
      .take(12)
    var sel = Vector.empty[(Long, Seq[Double])]
    val want = (1 to 5).map { _ =>
      val best = cands0
        .filter(c => !sel.exists(_._1 == c._1))
        .map { case (id, v, rel) =>
          val pen = if (sel.isEmpty) 0.0 else sel.map(s => cos(v, s._2)).max
          (id, v, 0.7 * rel - 0.3 * pen)
        }
        .sortBy { case (id, _, s) => (-s, id) }
        .head
      sel :+= ((best._1, best._2))
      best._1
    }
    assert(got === want)
  }

  test("k beyond the pool returns the exhausted pool, not an error") {
    val df = embDf(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0.1f),
      2L -> Seq(0.8f, 0.3f))
    // corpus has 2 candidates; asking for 5 returns both in pick order
    val out = Mmr.mmrTopK(df, "vec_id", "embedding", 0L, 5, 0.7, 0.3, 10)
      .orderBy("rank").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L))
  }

  test("candidate prune bounds the pool: k beyond candN is impossible") {
    val df = embDf(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0.1f),
      2L -> Seq(0.8f, 0.3f),
      3L -> Seq(0.5f, 0.5f))
    // candN = 2 -> only 2 candidates exist; asking k = 2 works
    val out = Mmr.mmrTopK(df, "vec_id", "embedding", 0L, 2, 0.7, 0.3, 2)
      .collect()
    assert(out.length === 2)
  }
}
