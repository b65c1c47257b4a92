package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Cluster, ContainmentJoin, Dedup, Mmr, TextAnalysis}

/**
 * q124-q129 — the curation-analytics tier: the rule-battery / model-based
 * filters and the dedup/selection end-games of a training-data pipeline
 * (Gopher-style rule audit, containment dedup, cross-source duplication
 * provenance, MMR diverse selection, frozen-classifier inference, cluster
 * canonicalization). Reference scope: extends the LLM-pipeline surface the
 * builder brief names; the trends reference (trends.go) has no equivalent.
 *
 * Shared convention: every filter/score the gate hashes is exact integer
 * arithmetic (ratio thresholds stated as cross-multiplications), doubles
 * appear only as final divisions or the bit-deterministic cosine chain.
 */
object CurationQueries {

  /** The 10-word stop list shared by q124/q128 (a frozen model artifact —
    * deliberately NOT derived from [[TextAnalysis.enStopwords]] so the
    * rule battery is stable even if the language heuristics evolve). */
  private val stop10 = Seq("the", "a", "an", "and", "or",
    "of", "to", "in", "is", "it")

  /** Per-doc integer text features (map-only, all codegen'd builtins):
    * word count, summed word length, distinct words, distinct stopwords
    * present, stopword occurrences, top-word frequency. Every term is
    * O(nw) or O(nw log nw) per document — maxfreq is the longest run in
    * the SORTED array via one fold (the naive
    * transform(distinct, w → count) form is O(nd·nw), quadratic on
    * mostly-distinct long documents). */
  private def featureCols(text: org.apache.spark.sql.Column) = {
    val ws = TextAnalysis.words(text)
    val stopArr = array(stop10.map(lit): _*)
    // (prev, run, best) fold over the sorted words; words() never yields
    // "" so the empty-string sentinel cannot collide
    val maxfreq = aggregate(
      array_sort(ws),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, w) => {
        val run = when(w === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    Seq(
      size(ws).as("nw"),
      aggregate(ws, lit(0), (acc, w) => acc + length(w)).as("sumlen"),
      size(array_distinct(ws)).as("nd"),
      size(array_intersect(ws, stopArr)).as("nstop_d"),
      size(filter(ws, w => w.isInCollection(stop10))).as("nstop_o"),
      maxfreq.as("maxfreq"))
  }

  private val featureSqlCte =
    """  SELECT source, doc_id,
      |    len(ws) AS nw,
      |    list_sum(list_transform(ws, x -> length(x))) AS sumlen,
      |    len(list_distinct(ws)) AS nd,
      |    len(list_intersect(ws,
      |      ['the','a','an','and','or','of','to','in','is','it'])) AS nstop_d,
      |    len(list_filter(ws, x -> x IN
      |      ('the','a','an','and','or','of','to','in','is','it'))) AS nstop_o,
      |    coalesce(list_max(map_values(list_aggregate(ws, 'histogram'))), 0)
      |      AS maxfreq
      |  FROM (SELECT source, doc_id,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |        FROM documents)""".stripMargin

  /** q124 — Gopher-style quality rule battery (Rae et al. 2021 §A1.1
    * adapted to this corpus's scale): five document rules — length in
    * [25,80] words, mean word length in [4.2,8] (stated as the integer
    * cross-products 10·sumlen ≥ 42·nw ∧ sumlen ≤ 8·nw), ≥2 distinct
    * stopwords, top-word frequency ≤ nw/8, type-token ratio ≥ 0.4
    * (5·nd ≥ 2·nw) — reported per source as independent fail counts plus
    * the all-rules pass count. Map-only feature pass into one hash
    * aggregate; every comparison integer-exact. */
  def q124GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.documents(spark, dir)
      .select(col("source") +: featureCols(col("text")): _*)
    val r1 = col("nw").between(25, 80)
    val r2 = col("sumlen") * 10 >= col("nw") * 42 &&
      col("sumlen") <= col("nw") * 8
    val r3 = col("nstop_d") >= 2
    val r4 = col("maxfreq") * 8 <= col("nw")
    val r5 = col("nd") * 5 >= col("nw") * 2
    def fails(c: org.apache.spark.sql.Column, name: String) =
      sum(when(!c, 1L).otherwise(0L)).cast("long").as(name)
    f.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        fails(r1, "fail_len"), fails(r2, "fail_wordlen"),
        fails(r3, "fail_stop"), fails(r4, "fail_rep"),
        fails(r5, "fail_ttr"),
        sum(when(r1 && r2 && r3 && r4 && r5, 1L).otherwise(0L)).cast("long")
          .as("n_pass"))
      .orderBy(col("source"))
  }

  val q124Sql: String =
    s"""WITH f AS (
       |$featureSqlCte)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN NOT (nw BETWEEN 25 AND 80) THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
       |  CAST(sum(CASE WHEN NOT (sumlen*10 >= nw*42 AND sumlen <= nw*8) THEN 1 ELSE 0 END) AS BIGINT) AS fail_wordlen,
       |  CAST(sum(CASE WHEN NOT (nstop_d >= 2) THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
       |  CAST(sum(CASE WHEN NOT (maxfreq*8 <= nw) THEN 1 ELSE 0 END) AS BIGINT) AS fail_rep,
       |  CAST(sum(CASE WHEN NOT (nd*5 >= nw*2) THEN 1 ELSE 0 END) AS BIGINT) AS fail_ttr,
       |  CAST(sum(CASE WHEN nw BETWEEN 25 AND 80 AND sumlen*10 >= nw*42
       |    AND sumlen <= nw*8 AND nstop_d >= 2 AND maxfreq*8 <= nw
       |    AND nd*5 >= nw*2 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
       |FROM f
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** q125 — containment (overlap-coefficient) dedup pairs
    * ([[graft.ops.ContainmentJoin]]): all pairs whose bigram-shingle
    * overlap coefficient |A∩B|/min(|A|,|B|) is ≥ 1/2 — the subset-
    * duplication signal Jaccard structurally misses (J of a snippet inside
    * a 10× page is ≈0.1; containment is ≈1). Engine: asymmetric pigeonhole
    * prefix filter (smaller side's rarest-gram prefix probes a full-token
    * index) + PPJoin-style positional bound + exact verify. Oracle: brute
    * force over all pairs — green iff the prefix stage has FULL recall
    * (the filters are exact, so this is an equivalence proof, not a
    * recall contract).
    *
    * Scale disclosure (round 12): containment at θ=1/2 over this corpus
    * is OUTPUT-quadratic by semantics (the r11 docs sweep timed it at
    * 54.8 s / 17× at 10× docs — all of it pair mass, not plan waste),
    * so this full form is gated and benched at sf0.1 but EXCLUDED from
    * the 10× sweep; [[q223ContainmentSample]] (the declared `doc_id %
    * 4 = 0` audit sample, same operator, same per-pair equivalence)
    * carries the sweep row. The sub-quadratic scale path for
    * full-corpus containment remains the LSH/set-sim family
    * (q26/q97/q129). */
  def q125ContainmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), 2).as("toks"))
    ContainmentJoin.prefixContainmentJoin(docs, "doc_id", "toks",
        thetaNum = 1, thetaDen = 2)
      .select(col("id_a"), col("id_b"), col("sz_a").cast("long").as("sz_a"),
        col("sz_b").cast("long").as("sz_b"),
        col("inter").cast("long").as("inter"), col("containment"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val q125Sql: String =
    """WITH sh AS (
      |  SELECT doc_id AS id,
      |    list_distinct(CASE WHEN len(words) < 2 THEN [array_to_string(words, ' ')]
      |         ELSE list_transform(range(len(words) - 1), i -> words[i+1] || ' ' || words[i+2])
      |    END) AS s
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS words
      |        FROM documents)),
      |sz AS (SELECT id, s, len(s) AS n FROM sh)
      |SELECT a.id AS id_a, b.id AS id_b, a.n AS sz_a, b.n AS sz_b,
      |  len(list_intersect(a.s, b.s)) AS inter,
      |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / least(a.n, b.n) AS containment
      |FROM sz a JOIN sz b ON a.id < b.id
      |WHERE len(list_intersect(a.s, b.s)) * 2 >= least(a.n, b.n)
      |ORDER BY id_a, id_b""".stripMargin

  /** q223 — [[q125ContainmentPairs]]'s DECLARED-SAMPLE twin for the 10×
    * sweep: the identical prefix-filtered containment engine over the
    * `doc_id % 4 = 0` audit sample (1/16 the pair mass). The per-pair
    * prefix-filter equivalence q125 proves is scale-free, so the sample
    * carries the sweep row while the full form's deliberate quadratic
    * output stays off the sweep's critical path (r12 verdict item 4). */
  def q223ContainmentSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), 2).as("toks"))
    ContainmentJoin.prefixContainmentJoin(docs, "doc_id", "toks",
        thetaNum = 1, thetaDen = 2)
      .select(col("id_a"), col("id_b"), col("sz_a").cast("long").as("sz_a"),
        col("sz_b").cast("long").as("sz_b"),
        col("inter").cast("long").as("inter"), col("containment"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val q223Sql: String =
    """WITH sh AS (
      |  SELECT doc_id AS id,
      |    list_distinct(CASE WHEN len(words) < 2 THEN [array_to_string(words, ' ')]
      |         ELSE list_transform(range(len(words) - 1), i -> words[i+1] || ' ' || words[i+2])
      |    END) AS s
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS words
      |        FROM documents WHERE doc_id % 4 = 0)),
      |sz AS (SELECT id, s, len(s) AS n FROM sh)
      |SELECT a.id AS id_a, b.id AS id_b, a.n AS sz_a, b.n AS sz_b,
      |  len(list_intersect(a.s, b.s)) AS inter,
      |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / least(a.n, b.n) AS containment
      |FROM sz a JOIN sz b ON a.id < b.id
      |WHERE len(list_intersect(a.s, b.s)) * 2 >= least(a.n, b.n)
      |ORDER BY id_a, id_b""".stripMargin

  /** q126 — cross-source duplication provenance matrix: the q26 near-dup
    * contract (bigram MinHash-LSH, J ≥ 0.5, exact-verified) rolled up by
    * normalized source pair — which sources copy which, the provenance
    * report dedup audits ship. Pair engine + two broadcast-sized source
    * lookups + one hash aggregate. */
  def q126CrossSourceDupMatrix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = PairStore.nearDupPairs(spark, dir)
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("s_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("s_b")), "id_b")
      .select(least(col("s_a"), col("s_b")).as("source_lo"),
        greatest(col("s_a"), col("s_b")).as("source_hi"),
        col("jaccard"))
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jaccard"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  val q126Sql: String =
    """WITH sh AS (
      |  SELECT doc_id AS id, source,
      |    list_distinct(CASE WHEN len(words) < 2 THEN [array_to_string(words, ' ')]
      |         ELSE list_transform(range(len(words) - 1), i -> words[i+1] || ' ' || words[i+2])
      |    END) AS s
      |  FROM (SELECT source, doc_id,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS words
      |        FROM documents)),
      |sz AS (SELECT id, source, s, len(s) AS n FROM sh),
      |pairs AS (
      |  SELECT least(a.source, b.source) AS source_lo,
      |    greatest(a.source, b.source) AS source_hi,
      |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / (a.n + b.n - len(list_intersect(a.s, b.s))) AS jaccard
      |  FROM sz a JOIN sz b
      |    ON a.id < b.id
      |   AND least(a.n, b.n) * 2 >= greatest(a.n, b.n)
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / (a.n + b.n - len(list_intersect(a.s, b.s))) >= 0.5)
      |SELECT source_lo, source_hi, count(*) AS n_pairs,
      |  max(jaccard) AS max_jaccard
      |FROM pairs
      |GROUP BY source_lo, source_hi
      |ORDER BY source_lo, source_hi""".stripMargin

  /** q127 — MMR diverse top-k selection ([[graft.ops.Mmr]]): greedy
    * `0.7·rel − 0.3·max-sim-to-selected` over the relevance-pruned top-64
    * candidate pool, query = vec_id 0, k = 8. Oracle: the same greedy
    * unrolled as eight chained one-row CTEs in DuckDB — every score a
    * fixed-order double chain (the q28 cosine convention), ties pinned by
    * vec_id, so rank, ids AND scores hash exactly. */
  def q127MmrSelect(spark: SparkSession, dir: String): DataFrame =
    Mmr.mmrTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
        queryId = 0L, k = 8, lambda = 0.7, penaltyWeight = 0.3, candN = 64)
      .select(col("rank"), col("id").as("vec_id"), col("rel"),
        col("mmr_score"))
      .orderBy(col("rank"))

  val q127Sql: String = {
    // cosine over two DOUBLE list expressions (the q28Sql fold shape)
    def sim(x: String, y: String): String =
      s"""(list_sum(list_transform(range(len($x)), i -> $x[i+1] * $y[i+1]))
         |    / (sqrt(list_sum(list_transform(range(len($x)), i -> $x[i+1] * $x[i+1])))
         |       * sqrt(list_sum(list_transform(range(len($y)), i -> $y[i+1] * $y[i+1])))))""".stripMargin
    val steps = (2 to 8).map { k =>
      val prev = (1 until k).map(j => s"s$j p$j").mkString(", ")
      val notIn = (1 until k).map(j => s"p$j.vec_id").mkString(", ")
      val sims = (1 until k).map(j => sim("c.e", s"p$j.e")).mkString(",\n    ")
      s"""s$k AS (
         |  SELECT c.vec_id, c.e, c.rel,
         |    0.7 * c.rel - 0.3 * greatest(
         |    $sims) AS score
         |  FROM cand c, $prev
         |  WHERE c.vec_id NOT IN ($notIn)
         |  ORDER BY score DESC, c.vec_id LIMIT 1)"""
    }.mkString(",\n")
    val unions = (1 to 8)
      .map(k => s"SELECT $k AS rank, vec_id, rel, score AS mmr_score FROM s$k")
      .mkString("\nUNION ALL\n")
    s"""WITH cand AS (
       |  SELECT vec_id,
       |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e,
       |    list_sum(list_transform(range(len(embedding)), i ->
       |        CAST(embedding[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(range(len(embedding)), i ->
       |          CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))))
       |       * sqrt(list_sum(list_transform(range(len(qv)), i ->
       |          CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))))) AS rel
       |  FROM embeddings, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
       |  WHERE vec_id <> 0
       |  ORDER BY rel DESC, vec_id LIMIT 64),
       |s1 AS (
       |  SELECT vec_id, e, rel, 0.7 * rel - 0.3 * 0.0 AS score
       |  FROM cand ORDER BY score DESC, vec_id LIMIT 1),
       |$steps
       |$unions
       |ORDER BY rank""".stripMargin
  }

  /** q128 — frozen linear quality-classifier inference: the fastText-style
    * "trained quality model scores every document" pass, with the model
    * frozen as INTEGER weights over integer features
    * (margin = 3·stopword_occurrences + 2·distinct_words + words −
    * 10·top_word_freq − 40) so inference is exact BIGINT arithmetic —
    * reported per source as positive-classification counts and margin
    * stats. Map-only + one hash aggregate; at 100 TB this is the shape of
    * any linear/distilled scorer: broadcast weights, codegen'd dot
    * product, zero shuffles before the roll-up. */
  def q128QualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.documents(spark, dir)
      .select(col("source") +: featureCols(col("text")): _*)
    val margin = (col("nstop_o") * 3 + col("nd") * 2 + col("nw")
      - col("maxfreq") * 10 - 40).cast("long")
    f.select(col("source"), margin.as("margin"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("margin") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_pos"),
        sum(col("margin")).cast("long").as("sum_margin"),
        min(col("margin")).as("min_margin"),
        max(col("margin")).as("max_margin"))
      .orderBy(col("source"))
  }

  val q128Sql: String =
    s"""WITH f AS (
       |$featureSqlCte),
       |m AS (
       |  SELECT source,
       |    CAST(nstop_o*3 + nd*2 + nw - maxfreq*10 - 40 AS BIGINT) AS margin
       |  FROM f)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(sum(margin) AS BIGINT) AS sum_margin,
       |  min(margin) AS min_margin,
       |  max(margin) AS max_margin
       |FROM m
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** q129 — dedup-cluster canonicalization: the step AFTER q43's connected
    * components — per near-dup cluster, elect the canonical survivor
    * (longest doc by n_chars, ties to the LOWEST doc_id, pinned on both
    * sides) and report member count: the "which copy do we keep" decision
    * that turns a pair list into a drop list. Engine: pair engine →
    * skew-safe CC → one struct-max argmax. Oracle: recursive-CTE closure
    * (q43's independent algorithm) + window argmax. */
  def q129CanonicalDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = PairStore.nearDupPairs(spark, dir)
    Cluster.connectedComponents(pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("component"))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_chars").as("chars"),
          (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("component"),
        (-col("best.neg_id")).as("canonical_id"),
        col("best.chars").as("canonical_chars"),
        col("n_members"))
      .orderBy(col("component"))
  }

  val q129Sql: String =
    """WITH RECURSIVE sh AS (
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
      |ranked AS (
      |  SELECT c.component, c.doc_id, d.n_chars,
      |    row_number() OVER (PARTITION BY c.component
      |      ORDER BY d.n_chars DESC, c.doc_id) AS rn,
      |    count(*) OVER (PARTITION BY c.component) AS n_members
      |  FROM comp c JOIN documents d USING (doc_id))
      |SELECT component, doc_id AS canonical_id,
      |  CAST(n_chars AS BIGINT) AS canonical_chars, n_members
      |FROM ranked WHERE rn = 1
      |ORDER BY component""".stripMargin
}
