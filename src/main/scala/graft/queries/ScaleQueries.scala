package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.ops.{BloomJoin, Cleaning, Dedup, Frequency, InvertedIndex, Merge, NgramLm, Similarity, SpanDedup, TimeSeries}

/**
 * Round-5 widening: shuffle-reduction and index-construction operators —
 * bloom semi-join pruning, sketch-verified heavy hitters, inverted-index
 * build. Each oracle-gated (DuckDB twin over the same parquet); the
 * sketches only PROPOSE, exact passes own every emitted row, so the gates
 * hold across engines.
 */
object ScaleQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q81 — bloom-pruned join ([[BloomJoin.prunedJoin]]): lineitem probed
    * against the low-nation supplier digest BEFORE the join shuffle; false
    * positives die in the join, so the result is hash-identical to the
    * undecorated join (the oracle IS that undecorated join — the gate
    * proves the reduction is semantically free). */
  def q81BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val supp = Tables.supplier(spark, dir).filter(col("s_nationkey") < 5)
    BloomJoin.prunedJoin(li, supp, "l_suppkey", "s_suppkey",
        expectedItems = 20000L, fpp = 0.01)
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(
        sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_suppkey"))
  }

  val q81Sql: String =
    """SELECT s_suppkey, s_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |WHERE s_nationkey < 5
      |GROUP BY s_suppkey, s_name
      |ORDER BY s_suppkey""".stripMargin

  /** Shared q82/q83 tokenizer: lowercased alpha runs. */
  private def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z]+"),
          t => length(t) > 0)).as("term"))

  /** q82 — heavy-hitter terms ([[Frequency.heavyHitters]]): KSP sketch
    * proposes ≤ 1/support candidates in one bounded-state pass, an exact
    * count pass verifies — output is exact, so the oracle is a sketch-free
    * GROUP BY + HAVING over the same tokens. */
  def q82HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Frequency.heavyHitters(tokens(spark, dir), "term", support = 0.002)
      .orderBy(col("cnt").desc, col("term"))

  val q82Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'),
      |    x -> length(x) > 0)) AS term
      |  FROM documents),
      |n AS (SELECT count(*) AS total FROM tok)
      |SELECT term, count(*) AS cnt
      |FROM tok CROSS JOIN n
      |GROUP BY term, n.total
      |HAVING CAST(count(*) AS DOUBLE) > 0.002 * CAST(n.total AS DOUBLE)
      |ORDER BY cnt DESC, term""".stripMargin

  /** q83 — inverted-index build ([[InvertedIndex.build]]): term admission
    * len ≥ 6 / df ≥ 2, postings bounded to the first 3 per term in
    * (doc_id, pos) order (the WindowGroupLimit-friendly rank filter). */
  def q83InvertedIndex(spark: SparkSession, dir: String): DataFrame =
    InvertedIndex.build(Tables.documents(spark, dir), "doc_id", "text",
        minTermLen = 6, minDocs = 2, postingsK = 3)
      .orderBy(col("term"), col("post_rank"))

  val q83Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
      |      x -> length(x) > 0) AS toks
      |  FROM documents),
      |post AS (
      |  SELECT doc_id, toks[p] AS term, CAST(p AS INTEGER) AS pos
      |  FROM t, UNNEST(generate_series(1, len(toks))) AS u(p)
      |  WHERE length(toks[p]) >= 6),
      |stats AS (
      |  SELECT term, count(DISTINCT doc_id) AS n_docs, count(*) AS tf_total
      |  FROM post GROUP BY term HAVING count(DISTINCT doc_id) >= 2),
      |ranked AS (
      |  SELECT term, doc_id, pos,
      |    CAST(row_number() OVER (PARTITION BY term ORDER BY doc_id, pos)
      |      AS INTEGER) AS post_rank
      |  FROM post)
      |SELECT r.term, s.n_docs, s.tf_total, r.post_rank, r.doc_id, r.pos
      |FROM ranked r JOIN stats s USING (term)
      |WHERE r.post_rank <= 3
      |ORDER BY r.term, r.post_rank""".stripMargin

  /** q84 — C4-style line cleaning ([[Cleaning.c4LineFilter]]). The corpus
    * ships single-line docs, so line structure is synthesized IN-QUERY
    * (`" the "` → `".\n"`, both engines build the identical string — the
    * q56 convention: the gate exercises the operator, not the
    * synthesizer); the filter then applies the real Raffel-et-al rules:
    * terminal punctuation, ≥ 5 words, blocklist, ≥ 3 surviving lines. */
  def q84C4Clean(spark: SparkSession, dir: String): DataFrame = {
    val lined = Tables.documents(spark, dir)
      .withColumn("text", replace(col("text"), lit(" the "), lit(".\n")))
    Cleaning.c4LineFilter(lined, "doc_id", "text", minWords = 5, minLines = 3)
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        col("kept_chars"), md5(col("cleaned")).as("cleaned_md5"),
        col("doc_kept"))
      .orderBy(col("doc_id"))
  }

  val q84Sql: String =
    """WITH lined AS (
      |  SELECT doc_id, replace(text, ' the ', '.' || chr(10)) AS text
      |  FROM documents),
      |t AS (
      |  SELECT doc_id, list_filter(
      |    list_transform(string_split(text, chr(10)), l -> trim(l)),
      |    l -> length(l) > 0) AS lines
      |  FROM lined),
      |k AS (
      |  SELECT doc_id, lines, list_filter(lines, l ->
      |      right(l, 1) IN ('.', '!', '?')
      |      AND len(list_filter(string_split(l, ' '),
      |        w -> length(w) > 0)) >= 5
      |      AND NOT contains(lower(l), 'javascript')
      |      AND NOT contains(lower(l), 'lorem ipsum')
      |      AND NOT contains(lower(l), 'cookie')
      |      AND NOT contains(l, '{')) AS kept
      |  FROM t)
      |SELECT doc_id,
      |  CAST(len(lines) AS INTEGER) AS n_lines,
      |  CAST(len(kept) AS INTEGER) AS n_kept,
      |  CAST(coalesce(list_sum(list_transform(kept, l -> length(l))), 0)
      |    AS BIGINT) AS kept_chars,
      |  md5(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_md5,
      |  len(kept) >= 3 AS doc_kept
      |FROM k
      |ORDER BY doc_id""".stripMargin

  /** q85/q85-oracle shared centroid formula: K=8 deterministic 64-dim
    * centroids, c[j][d] = ((j·31 + d·17) mod 13 − 6) / 6 — literals in
    * both engines, so assignment is engine-reproducible (no k-means). */
  private val ivfCentroids: Seq[Seq[Double]] =
    Seq.tabulate(8)(j => Seq.tabulate(64)(d =>
      ((j * 31 + d * 17) % 13 - 6) / 6.0))

  /** q85 — IVF-partitioned semantic near-dup ([[Similarity
    * .ivfNearDupPairs]]): argmax-cosine cell assignment (map-only), then
    * same-cell pairs with exact cosine ≥ 0.35 — Σ|cell|² work instead of
    * n². The oracle replays assignment AND verify in SQL, so the gate
    * covers the quantizer, the tie-break and the pair stage. */
  def q85IvfNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfNearDupPairs(Tables.embeddings(spark, dir), "vec_id",
        "embedding", ivfCentroids, threshold = 0.35)
      .orderBy(col("id_a"), col("id_b"))

  val q85Sql: String = {
    def cos(a: String, b: String): String =
      s"""list_sum(list_transform(range(64), i ->
         |      CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform(range(64), i ->
         |        CAST($a[i+1] AS DOUBLE) * CAST($a[i+1] AS DOUBLE))))
         |      * sqrt(list_sum(list_transform(range(64), i ->
         |        CAST($b[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)))))"""
        .stripMargin
    s"""WITH cent AS (
       |  SELECT j, list_transform(range(64), d ->
       |    (CAST((j*31 + d*17) % 13 AS DOUBLE) - 6) / 6.0) AS c
       |  FROM range(8) t(j)),
       |scored AS (
       |  SELECT vec_id, j, ${cos("embedding", "c")} AS cos
       |  FROM embeddings CROSS JOIN cent),
       |assigned AS (
       |  SELECT vec_id, CAST(j AS INTEGER) AS cluster FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, j) AS rn FROM scored)
       |  WHERE rn = 1),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
       |    ${cos("ea.embedding", "eb.embedding")} AS cos_sim
       |  FROM assigned a
       |  JOIN assigned b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id)
       |SELECT id_a, id_b, cluster, cos_sim
       |FROM pairs WHERE cos_sim >= 0.35
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q87 — verbatim shared-span pairs ([[SpanDedup.sharedSpanPairs]]):
    * 12-token sliding windows, spans identifying iff in 2..20 docs
    * (commoner = boilerplate, handled by the q54 dictionary), pair count
    * per doc pair. Engine groups on the 64-bit span hash; the oracle
    * groups on the span TEXT — the gate passing is the collision-freeness
    * witness. */
  def q87SharedSpans(spark: SparkSession, dir: String): DataFrame =
    SpanDedup.sharedSpanPairs(Tables.documents(spark, dir), "doc_id",
        "text", spanLen = 12, minDocs = 2, maxDocs = 20)
      .orderBy(col("id_a"), col("id_b"))

  val q87Sql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'),
      |    x -> length(x) > 0) AS toks
      |  FROM documents),
      |sp AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[g:g+11], ' ') AS span
      |  FROM t, UNNEST(generate_series(1, len(toks) - 11)) AS u(g)
      |  WHERE len(toks) >= 12),
      |freq AS (
      |  SELECT span FROM sp GROUP BY span
      |  HAVING count(*) BETWEEN 2 AND 20)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_spans
      |FROM sp a
      |JOIN sp b ON a.span = b.span AND a.doc_id < b.doc_id
      |JOIN freq f ON a.span = f.span
      |GROUP BY 1, 2
      |ORDER BY id_a, id_b""".stripMargin

  /** q86 — keyed MERGE via changelog replay ([[Merge.applyChangelog]]):
    * a deterministic CDC batch synthesized from `orders` (two update
    * generations on overlapping keys — latest wins —, deletes, inserts
    * on fresh keys) compacted and merged into the snapshot. The oracle
    * replays the same changelog with window + anti-join SQL. */
  def q86MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    def ev(filterMod: Long, filterRes: Long, price: Column, status: Column,
           op: String, seq: Long): DataFrame =
      o.filter(col("o_orderkey") % filterMod === filterRes)
        .select(col("o_orderkey"), price.as("o_totalprice"),
          status.as("o_orderstatus"), lit(op).as("op"), lit(seq).as("seq"))
    val changelog =
      ev(10L, 3L, col("o_totalprice") * lit(1.1), col("o_orderstatus"), "U", 1L)
        .unionByName(ev(100L, 3L, col("o_totalprice") * lit(1.2),
          col("o_orderstatus"), "U", 2L))
        .unionByName(ev(10L, 7L, col("o_totalprice"),
          col("o_orderstatus"), "D", 1L))
        .unionByName(o.filter(col("o_orderkey") % 1000 === 1)
          .select((col("o_orderkey") + lit(20000000L)).as("o_orderkey"),
            lit(42.0).as("o_totalprice"), lit("N").as("o_orderstatus"),
            lit("I").as("op"), lit(1L).as("seq")))
    Merge.applyChangelog(o, changelog, Seq("o_orderkey"), "seq", "op",
        broadcastChanges = true)
      .orderBy(col("o_orderkey"))
  }

  val q86Sql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      |ch AS (
      |  SELECT o_orderkey, o_totalprice * CAST(1.1 AS DOUBLE)
      |      AS o_totalprice, o_orderstatus, 'U' AS op, 1 AS seq
      |    FROM o WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice * CAST(1.2 AS DOUBLE),
      |      o_orderstatus, 'U', 2
      |    FROM o WHERE o_orderkey % 100 = 3
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, o_orderstatus, 'D', 1
      |    FROM o WHERE o_orderkey % 10 = 7
      |  UNION ALL
      |  SELECT o_orderkey + 20000000, CAST(42.0 AS DOUBLE), 'N', 'I', 1
      |    FROM o WHERE o_orderkey % 1000 = 1),
      |latest AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus, op FROM (
      |    SELECT ch.*, row_number() OVER (PARTITION BY o_orderkey
      |      ORDER BY seq DESC) AS rn FROM ch)
      |  WHERE rn = 1),
      |merged AS (
      |  SELECT o.o_orderkey, o.o_totalprice, o.o_orderstatus
      |  FROM o LEFT JOIN latest l ON o.o_orderkey = l.o_orderkey
      |  WHERE l.op IS NULL
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, o_orderstatus
      |  FROM latest WHERE op <> 'D')
      |SELECT * FROM merged
      |ORDER BY o_orderkey""".stripMargin

  /** q88 — per-type daily anomaly days ([[TimeSeries.anomalyDays]]):
    * z-scores derived from exact integer sums (D, Σn, Σn²) so every
    * double is one deterministic IEEE op from BIGINTs — no
    * shuffle-order-dependent float aggregation, which is why the hash
    * gate can cover a variance computation at all. */
  def q88AnomalyDays(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.anomalyDays(Tables.events(spark, dir), "event_type", "ts",
        zThresh = 2.0)
      .orderBy(col("event_type"), col("day"))

  val q88Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT daily.*, count(*) OVER w AS d,
      |    CAST(sum(n) OVER w AS BIGINT) AS s,
      |    CAST(sum(n*n) OVER w AS BIGINT) AS q
      |  FROM daily WINDOW w AS (PARTITION BY event_type)),
      |z AS (
      |  SELECT event_type, day, n,
      |    CASE WHEN d >= 2 AND
      |        CAST(d*q - s*s AS DOUBLE) / CAST(d*(d-1) AS DOUBLE) > 0
      |      THEN (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(d AS DOUBLE))
      |        / sqrt(CAST(d*q - s*s AS DOUBLE) / CAST(d*(d-1) AS DOUBLE))
      |    END AS zscore
      |  FROM stats)
      |SELECT event_type, day, n, zscore,
      |  coalesce(abs(zscore) > 2.0, false) AS is_anomaly
      |FROM z
      |ORDER BY event_type, day""".stripMargin

  /** q89 — trailing 7-day active users ([[TimeSeries
    * .trailingActiveUsers]]): dedup to (user, day), map-side ×7 expand,
    * one distinct-aggregate per observation day — exact sliding distinct
    * with no range self-join and no per-day rescan. */
  def q89TrailingActive(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.trailingActiveUsers(Tables.events(spark, dir), "ts",
        "user_id", windowDays = 7)
      .orderBy(col("day"))

  val q89Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
      |days AS (SELECT DISTINCT day FROM ud),
      |expd AS (
      |  SELECT u, CAST(o AS INTEGER) AS off,
      |    day + CAST(o AS INTEGER) AS obs_day
      |  FROM ud, UNNEST(generate_series(0, 6)) AS t(o)),
      |agg AS (
      |  SELECT obs_day, count(DISTINCT u) AS wau,
      |    count(DISTINCT CASE WHEN off = 0 THEN u END) AS dau
      |  FROM expd JOIN days d ON expd.obs_day = d.day
      |  GROUP BY obs_day)
      |SELECT obs_day AS day, wau, dau,
      |  CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
      |FROM agg
      |ORDER BY day""".stripMargin

  /** q90 query terms — fixed order: the pivot sums term scores in THIS
    * order on both engines (a float sum's order is part of the result). */
  private val bm25Terms = Seq("stream", "vector", "window")

  /** q90 — BM25-shaped top-20 retrieval ([[InvertedIndex.bm25TopK]]):
    * rational idf (no libm log — documented deviation, monotone-
    * equivalent per term), fixed-order pivot sum, k1=1.2 / b=0.75.
    * 1.2+1 == 2.2 and 1−0.75 == 0.25 exactly in IEEE, so the SQL
    * literals below are the engine's constants. */
  def q90Bm25(spark: SparkSession, dir: String): DataFrame =
    InvertedIndex.bm25TopK(Tables.documents(spark, dir), "doc_id", "text",
        bm25Terms, k1 = 1.2, b = 0.75, topK = 20)

  val q90Sql: String = {
    val slot = bm25Terms
      .map(t => s"coalesce(max(CASE WHEN term = '$t' THEN score_t END), 0.0)")
      .mkString("\n  + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(lower(text), '[^a-z]+'),
       |    x -> length(x) > 0)) AS term
       |  FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |totals AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
       |  FROM dl),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tok
       |  WHERE term IN (${bm25Terms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |      / (CAST(df AS DOUBLE) + 0.5))
       |    * (CAST(tf AS DOUBLE) * 2.2
       |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
       |        * (CAST(dl AS DOUBLE)
       |          / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
       |      AS score_t
       |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
       |  CROSS JOIN totals),
       |piv AS (
       |  SELECT doc_id,
       |  $slot AS score
       |  FROM scored GROUP BY doc_id)
       |SELECT doc_id, score FROM piv
       |ORDER BY score DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  /** q91 — Kneser–Ney bigram LM ([[NgramLm.kneserNeyBigrams]], d=0.75):
    * real smoothed probabilities hash-gated across engines — possible
    * because every pkn is a fixed IEEE-op sequence over exact integer
    * counts. Full model (minCount 1) ordered by bigram. */
  def q91KneserNey(spark: SparkSession, dir: String): DataFrame =
    NgramLm.kneserNeyBigrams(Tables.documents(spark, dir), "text",
        d = 0.75, minCount = 1L)
      .orderBy(col("w1"), col("w2"))

  val q91Sql: String =
    """WITH t AS (
      |  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
      |    x -> length(x) > 0) AS toks
      |  FROM documents),
      |bi AS (
      |  SELECT toks[g] AS w1, toks[g+1] AS w2
      |  FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(g)
      |  WHERE len(toks) >= 2),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
      |byw1 AS (
      |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1p_w1
      |  FROM c12 GROUP BY w1),
      |byw2 AS (SELECT w2, count(*) AS n1p_cont FROM c12 GROUP BY w2),
      |tot AS (SELECT count(*) AS n1p_total FROM c12)
      |SELECT w1, w2, c12, c1,
      |  greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)
      |  + (0.75 * CAST(n1p_w1 AS DOUBLE) / CAST(c1 AS DOUBLE))
      |    * (CAST(n1p_cont AS DOUBLE) / CAST(n1p_total AS DOUBLE)) AS pkn
      |FROM c12 JOIN byw1 USING (w1) JOIN byw2 USING (w2) CROSS JOIN tot
      |ORDER BY w1, w2""".stripMargin

  /** q92 — near-dup graph degree census: how many docs have how many
    * near-dup partners (the shape a dedup rollout reviews before picking
    * keep-one-per-cluster vs threshold changes). Pure composition over
    * the gated q26 pair engine; the oracle wraps the q26 brute-force
    * oracle as a CTE and aggregates the same census. */
  def q92DegreeCensus(spark: SparkSession, dir: String): DataFrame = {
    val pairs = PairStore.nearDupPairs(spark, dir)
    val ends = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
    ends.groupBy(col("id")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("degree"))
  }

  // concatenated OUTSIDE any stripMargin literal: the embedded q26 oracle
  // contains SQL `||` concatenation, which a re-strip would mangle
  val q92Sql: String =
    "WITH pairs AS (\n" + graft.queries.ExtQueries.q26Sql + "\n),\n" +
      """ends AS (
        |  SELECT id_a AS id FROM pairs
        |  UNION ALL SELECT id_b FROM pairs),
        |deg AS (SELECT id, count(*) AS degree FROM ends GROUP BY id)
        |SELECT degree, count(*) AS n_docs
        |FROM deg GROUP BY degree
        |ORDER BY degree""".stripMargin
}
