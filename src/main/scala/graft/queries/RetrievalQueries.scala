package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Checksum, Chunking, Cluster, Fusion, InvertedIndex,
  Similarity, TextAnalysis}

/**
 * q130-q134 — the retrieval-and-accounting tier: hybrid lexical+semantic
 * retrieval fusion, tokenizer load auditing, fill-in-the-middle sample
 * construction, dedup-aware net-token accounting, and temperature-scaled
 * source-mixing weights. Reference scope: extends the LLM-pipeline
 * surface the builder brief names; the trends reference (trends.go) has
 * no equivalent.
 *
 * Numeric convention (the suite's): counts and split points are exact
 * integers; the only doubles are final divisions, sqrt (correctly rounded
 * in IEEE 754), and fixed-order folds mirrored literally in the oracle.
 */
object RetrievalQueries {

  /** q130's retriever inputs — the lexical terms are q90's (fixed order:
    * the BM25 pivot sums term scores in this order on both engines) and
    * the semantic query is q28's vec_id 0, so each retriever reuses a
    * contract the gate already proved. */
  private val rrfTerms = Seq("stream", "vector", "window")

  /** q130 — hybrid retrieval via Reciprocal-Rank Fusion
    * ([[graft.ops.Fusion]]): BM25 top-50 (q90's scorer) ⊕ brute-force
    * cosine top-50 (q28's scorer) fused as Σ 1/(60+rank), top 20.
    * vec_id ≡ doc_id where both tables cover an id (the corpus's
    * embedding convention); ids ranked by only one retriever carry rank 0
    * for the other (an integer sentinel — nullable ints round-trip as
    * float64 through pandas bridges). Fusion touches only the two ≤50-row
    * lists: at 100 TB the corpus cost lives in the retrievers, which are
    * gated and scaled on their own. */
  def q130RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val lex = Fusion.rankByScore(
      InvertedIndex.bm25TopK(docs, "doc_id", "text", rrfTerms,
        k1 = 1.2, b = 0.75, topK = 50),
      "doc_id", "score")
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val sem = Fusion.rankByScore(
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          Similarity.cosine(col("embedding"), col("qv")).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(50),
      "doc_id", "score")
    Fusion.rrfFuse(lex, sem, "doc_id", k = 60, topN = 20)
      .select(col("doc_id"), col("rank_a").as("lex_rank"),
        col("rank_b").as("sem_rank"), col("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
  }

  val q130Sql: String = {
    val slot = rrfTerms
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
       |  WHERE term IN (${rrfTerms.map(t => s"'$t'").mkString(", ")})
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
       |lex AS (
       |  SELECT doc_id, $slot AS score
       |  FROM scored GROUP BY doc_id
       |  ORDER BY score DESC, doc_id LIMIT 50),
       |lexr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
       |  FROM lex),
       |sem AS (
       |  SELECT vec_id AS doc_id,
       |    list_sum(list_transform(range(len(embedding)), i ->
       |        CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(range(len(embedding)), i ->
       |          CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))))
       |       * sqrt(list_sum(list_transform(range(len(qv)), i ->
       |          CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))))) AS score
       |  FROM embeddings,
       |    (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
       |  WHERE vec_id <> 0
       |  ORDER BY score DESC, doc_id LIMIT 50),
       |semr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
       |  FROM sem),
       |fused AS (
       |  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
       |    coalesce(l.rnk, 0) AS lex_rank,
       |    coalesce(s.rnk, 0) AS sem_rank,
       |    (CASE WHEN l.rnk IS NOT NULL
       |       THEN 1.0 / (60.0 + CAST(l.rnk AS DOUBLE)) ELSE 0.0 END)
       |    + (CASE WHEN s.rnk IS NOT NULL
       |       THEN 1.0 / (60.0 + CAST(s.rnk AS DOUBLE)) ELSE 0.0 END)
       |      AS rrf_score
       |  FROM lexr l FULL OUTER JOIN semr s USING (doc_id))
       |SELECT doc_id, lex_rank, sem_rank, rrf_score
       |FROM fused
       |ORDER BY rrf_score DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  /** q131 — tokenizer fertility audit: per source, exact integer sums of
    * characters, whitespace tokens and BPE-ish subword tokens (q22's two
    * gated counters), then chars-per-subword ("fertility", the standard
    * multilingual tokenizer-load diagnostic) and subwords-per-word as the
    * only two divisions. Map-only feature pass + one hash aggregate —
    * the 100 TB shape of any corpus-statistics sweep. */
  def q131TokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("nws"),
        TextAnalysis.tokenCountBpe(col("text")).cast("long").as("nbpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        sum(col("nws")).cast("long").as("sum_ws_tokens"),
        sum(col("nbpe")).cast("long").as("sum_bpe_tokens"))
      .withColumn("fertility",
        col("sum_chars").cast("double") / col("sum_bpe_tokens").cast("double"))
      .withColumn("bpe_per_word",
        col("sum_bpe_tokens").cast("double") / col("sum_ws_tokens").cast("double"))
      .orderBy(col("source"))

  val q131Sql: String =
    s"""WITH f AS (
       |  SELECT source, n_chars,
       |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS nws,
       |    len(regexp_extract_all(text, '${TextAnalysis.bpeTokenPattern}')) AS nbpe
       |  FROM documents)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(nws) AS BIGINT) AS sum_ws_tokens,
       |  CAST(sum(nbpe) AS BIGINT) AS sum_bpe_tokens,
       |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(nbpe) AS DOUBLE) AS fertility,
       |  CAST(sum(nbpe) AS DOUBLE) / CAST(sum(nws) AS DOUBLE) AS bpe_per_word
       |FROM f
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** q132 — fill-in-the-middle sample audit ([[Chunking.fimSplit]]):
    * deterministic (prefix ⌊nw/2⌋, middle ⌊nw/4⌋, suffix rest) word
    * splits — replayable across engines/partitionings/retries, unlike
    * rand() splits — audited per source: FIM vs passthrough counts,
    * exact per-part word sums, and an order-independent 48-bit-md5
    * checksum of the middle texts (q98's digest convention) proving the
    * REASSEMBLED middles, not just their lengths, match. Split + digest
    * are map-only; one hash aggregate. */
  def q132FimAudit(spark: SparkSession, dir: String): DataFrame = {
    val f = Chunking.fimSplit(
      Tables.documents(spark, dir).select(col("source"), col("text")),
      "text", minWords = 4)
    val midDigest = Checksum.rowDigest(Seq(concat_ws(" ", col("middle_w"))))
      .cast("decimal(38,0)")
    f.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_fim"), 1L).otherwise(0L)).cast("long").as("n_fim"),
        sum(when(!col("is_fim"), 1L).otherwise(0L)).cast("long")
          .as("n_passthrough"),
        sum(size(col("prefix_w"))).cast("long").as("sum_prefix_w"),
        sum(size(col("middle_w"))).cast("long").as("sum_middle_w"),
        sum(size(col("suffix_w"))).cast("long").as("sum_suffix_w"),
        sum(when(col("is_fim"), midDigest).otherwise(lit(0)))
          .cast("decimal(38,0)").cast("string").as("middle_checksum"))
      .orderBy(col("source"))
  }

  val q132Sql: String =
    """WITH w AS (
      |  SELECT source,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |f AS (
      |  SELECT source, len(ws) AS nw, len(ws) >= 4 AS is_fim,
      |    len(ws) // 2 AS p, len(ws) // 4 AS m, ws
      |  FROM w),
      |parts AS (
      |  SELECT source, is_fim,
      |    CASE WHEN is_fim THEN p ELSE nw END AS prefix_w,
      |    CASE WHEN is_fim THEN m ELSE 0 END AS middle_w,
      |    CASE WHEN is_fim THEN nw - p - m ELSE 0 END AS suffix_w,
      |    CASE WHEN is_fim
      |      THEN array_to_string(ws[p+1:p+m], ' ') ELSE '' END AS mid_text
      |  FROM f)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN is_fim THEN 1 ELSE 0 END) AS BIGINT) AS n_fim,
      |  CAST(sum(CASE WHEN is_fim THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_passthrough,
      |  CAST(sum(prefix_w) AS BIGINT) AS sum_prefix_w,
      |  CAST(sum(middle_w) AS BIGINT) AS sum_middle_w,
      |  CAST(sum(suffix_w) AS BIGINT) AS sum_suffix_w,
      |  CAST(CAST(sum(CASE WHEN is_fim THEN
      |      CAST(CAST(concat('0x', substr(md5(
      |        length(mid_text) || ':' || mid_text), 1, 12))
      |      AS BIGINT) AS DECIMAL(38,0))
      |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS VARCHAR)
      |    AS middle_checksum
      |FROM parts
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** q133 — dedup-aware net-token accounting: the "how much UNIQUE data
    * do we actually have" report — per source, total BPE tokens vs the
    * tokens lost to near-dup canonicalization (q129's contract: MinHash-
    * LSH pairs → connected components → keep the longest member, ties to
    * lowest doc_id; every non-canonical member's tokens count as
    * dropped). Pair engine + skew-safe CC on the duplicate subgraph only;
    * the corpus-wide work is one map + two hash aggregates. Oracle: the
    * independent recursive-CTE closure. */
  def q133NetTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = PairStore.nearDupPairs(spark, dir)
    locally {
      val mem = Cluster.connectedComponents(pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("component"))
      val canon = mem
        .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .groupBy(col("component"))
        .agg(max(struct(col("n_chars").as("chars"),
          (-col("doc_id")).as("neg_id"))).as("best"))
        .select(col("component"), (-col("best.neg_id")).as("canonical_id"))
      val drops = mem.join(canon, "component")
        .filter(col("doc_id") =!= col("canonical_id"))
        .select(col("doc_id"))
      // ONE tokenization pass: the totals and the dropped-subset sums used
      // to be two aggregate branches over `toks`, each re-scanning and
      // re-tokenizing every document (self-joins recompute shared
      // subplans) — the regexp tokenizer IS this query's cost. A broadcast
      // left join flags dropped docs (drops is doc_id-unique: one row per
      // node of the dup graph) and one hash aggregate carries all four
      // sums, so the corpus is scanned and tokenized exactly once.
      val toks = docs.select(col("source"), col("doc_id"),
        TextAnalysis.tokenCountBpe(col("text")).cast("long").as("toks"))
      toks
        .join(broadcast(drops.withColumn("__dropped", lit(true))),
          Seq("doc_id"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast("long").as("total_tokens"),
          sum(when(col("__dropped"), 1L).otherwise(0L)).cast("long")
            .as("n_dropped"),
          sum(when(col("__dropped"), col("toks")).otherwise(0L))
            .cast("long").as("dropped_tokens"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("n_dropped"), col("dropped_tokens"),
          (col("total_tokens") - col("dropped_tokens")).as("net_tokens"))
        .orderBy(col("source"))
    }
  }

  val q133Sql: String =
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id AS id,
       |    list_distinct(CASE WHEN len(words) < 2 THEN [array_to_string(words, ' ')]
       |         ELSE list_transform(range(len(words) - 1), i -> words[i+1] || ' ' || words[i+2])
       |    END) AS s
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(text, ' '), x -> x <> '') AS words
       |        FROM documents)),
       |sz AS (SELECT id, s, len(s) AS n FROM sh),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b
       |  FROM sz a JOIN sz b
       |    ON a.id < b.id
       |   AND least(a.n, b.n) * 2 >= greatest(a.n, b.n)
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / (a.n + b.n - len(list_intersect(a.s, b.s))) >= 0.5),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT src AS node, dst AS r FROM edges
       |  UNION
       |  SELECT rr.node, e.dst FROM reach rr JOIN edges e ON rr.r = e.src),
       |comp AS (
       |  SELECT node AS doc_id, least(node, min(r)) AS component
       |  FROM reach GROUP BY node),
       |canon AS (
       |  SELECT component, doc_id,
       |    row_number() OVER (PARTITION BY component
       |      ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM comp JOIN documents USING (doc_id)),
       |drops AS (SELECT doc_id FROM canon WHERE rn > 1),
       |toks AS (
       |  SELECT source, doc_id,
       |    len(regexp_extract_all(text, '${TextAnalysis.bpeTokenPattern}'))
       |      AS toks
       |  FROM documents)
       |SELECT t.source, count(*) AS n_docs,
       |  CAST(sum(t.toks) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dropped,
       |  CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN t.toks ELSE 0 END)
       |    AS BIGINT) AS dropped_tokens,
       |  CAST(sum(t.toks) AS BIGINT)
       |    - CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN t.toks ELSE 0 END)
       |      AS BIGINT) AS net_tokens
       |FROM toks t LEFT JOIN drops d ON t.doc_id = d.doc_id
       |GROUP BY t.source
       |ORDER BY t.source""".stripMargin

  /** q134 — temperature-scaled source-mixing weights (the multilingual
    * sampling formula w_s ∝ tokens_s^α at α = 1/2 — sqrt is CORRECTLY
    * ROUNDED in IEEE 754, unlike pow(x, 0.3) whose libm last-ulp varies
    * per engine, so α = 1/2 is the hash-gateable temperature): per-source
    * exact integer token totals, then weight = sqrt(tokens_s) / Σ_s
    * sqrt(tokens_s), the denominator a FIXED-ORDER fold over the
    * source-sorted array (a float sum over rows would add in shuffle
    * order). The fold runs over ~|sources| values — driver-bounded like
    * q127's candidate set, never corpus-sized. */
  def q134MixingWeights(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"),
        TextAnalysis.tokenCountBpe(col("text")).cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(sum(col("toks")).cast("long").as("tokens"))
    val denom = tok
      .agg(aggregate(
        array_sort(collect_list(struct(col("source"), col("tokens")))),
        lit(0.0),
        (acc, x) => acc + sqrt(x.getField("tokens").cast("double")))
        .as("denom"))
    tok.crossJoin(broadcast(denom))
      .select(col("source"), col("tokens"),
        sqrt(col("tokens").cast("double")).as("sqrt_tokens"),
        (sqrt(col("tokens").cast("double")) / col("denom")).as("weight"))
      .orderBy(col("source"))
  }

  val q134Sql: String =
    s"""WITH tok AS (
       |  SELECT source,
       |    CAST(sum(len(regexp_extract_all(text,
       |      '${TextAnalysis.bpeTokenPattern}'))) AS BIGINT) AS tokens
       |  FROM documents
       |  GROUP BY source),
       |denom AS (
       |  SELECT list_reduce(
       |    list_prepend(CAST(0.0 AS DOUBLE),
       |      list(sqrt(CAST(tokens AS DOUBLE)) ORDER BY source)),
       |    (acc, x) -> acc + x) AS denom
       |  FROM tok)
       |SELECT source, tokens,
       |  sqrt(CAST(tokens AS DOUBLE)) AS sqrt_tokens,
       |  sqrt(CAST(tokens AS DOUBLE)) / denom AS weight
       |FROM tok CROSS JOIN denom
       |ORDER BY source""".stripMargin
}
