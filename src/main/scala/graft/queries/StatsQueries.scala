package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Auc, CardEst, ColumnStats, Ols, Pq, Privacy, Sampling, Skew, SplitSearch, Triangles}

/**
 * q174-q187 — the statistics-and-index tier (incl. exact ROC-AUC): the artifacts a corpus
 * warehouse computes ABOUT its data to plan, release and index it.
 * Global transitivity and per-node clustering coefficients of the
 * near-dup graph (is the duplication structure cliques or chains?), the
 * ANALYZE-style single-shuffle column-stats collector (CBO food next to
 * q173's equi-depth histogram), exact decision-tree split search —
 * single- and all-features-one-pass — (the gradient-boosting inner
 * loop), distinct l-diversity release auditing (the step after q135's
 * k-anonymity), and product quantization with asymmetric-distance top-k
 * plus IVF-PQ routing (the memory-compression half of a billion-vector
 * ANN index).
 *
 * No counterpart in the reference (trends.go ends at the sink); these
 * are the training-data-pipeline extensions the builder brief names.
 */
object StatsQueries {

  /** q174 — global transitivity of the near-dup graph
    * ([[graft.ops.Triangles.transitivity]], degree-ordered node-iterator
    * — Schank-Wagner): ONE row, total triangles, total wedges and the
    * ratio 3T/W as an exact integer fraction — the whole-graph
    * clique-vs-chain scalar. The PER-NODE censuses are its siblings:
    * q155 counts each doc's triangles (id-ordered wedge join), q179 its
    * coefficient pair; this query is the graph-level roll-up, and its
    * engine path is the degree-ORIENTED one whose wedge volume survives
    * power-law hubs (Σ min-deg² vs q155's Σ deg²). The oracle recomputes
    * pairs brute-force (the q26 CTE) and closes triangles by id-ordered
    * triple join — different algorithm, same integers. */
  def q174Transitivity(spark: SparkSession, dir: String): DataFrame =
    Triangles.transitivity(PairStore.nearDupPairs(spark, dir))

  // concatenated OUTSIDE stripMargin (the embedded q26 oracle contains ||)
  val q174Sql: String =
    "WITH pairs AS (\n" + ExtQueries.q26Sql + "\n),\n" +
      """e AS (SELECT id_a, id_b FROM pairs),
        |tri AS (
        |  SELECT count(*) AS t FROM (
        |    SELECT 1 AS one
        |    FROM e p1
        |    JOIN e p2 ON p2.id_a = p1.id_b
        |    JOIN e p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b)),
        |deg AS (
        |  SELECT id, count(*) AS degree FROM (
        |    SELECT id_a AS id FROM e
        |    UNION ALL SELECT id_b FROM e) GROUP BY id),
        |w AS (
        |  SELECT CAST(sum(degree * (degree - 1)) // 2 AS BIGINT)
        |    AS n_wedges FROM deg)
        |SELECT CAST(t AS BIGINT) AS n_triangles, n_wedges,
        |  CAST(t * 3 AS BIGINT) AS trans_num,
        |  n_wedges AS trans_den
        |FROM tri, w""".stripMargin

  /** q175 — ANALYZE-style column statistics over part's categorical
    * columns ([[graft.ops.ColumnStats]]): exact NDV, null count and
    * top-3 most-common values per column from ONE stacked hash aggregate
    * (k columns ≠ k table scans). p_name's all-distinct tail (every
    * count 1, rank decided by the value tie-break) exercises the
    * deterministic-MCV contract. */
  def q175ColumnStats(spark: SparkSession, dir: String): DataFrame =
    ColumnStats.stackedStats(Tables.part(spark, dir),
        Seq("p_brand", "p_type", "p_name"), topK = 3)
      .orderBy(col("col_name"), col("mcv_rank").asc_nulls_last)

  val q175Sql: String =
    """WITH stacked AS (
      |  SELECT 'p_brand' AS col_name, p_brand AS value FROM part
      |  UNION ALL SELECT 'p_type', p_type FROM part
      |  UNION ALL SELECT 'p_name', p_name FROM part),
      |freq AS (
      |  SELECT col_name, value, count(*) AS cnt
      |  FROM stacked GROUP BY col_name, value),
      |per_col AS (
      |  SELECT col_name, CAST(sum(cnt) AS BIGINT) AS n_rows,
      |    CAST(sum(CASE WHEN value IS NULL THEN cnt ELSE 0 END) AS BIGINT)
      |      AS n_nulls,
      |    count(value) AS ndv
      |  FROM freq GROUP BY col_name),
      |mcv AS (
      |  SELECT col_name, value, cnt,
      |    row_number() OVER (PARTITION BY col_name
      |                       ORDER BY cnt DESC, value) AS mcv_rank
      |  FROM freq WHERE value IS NOT NULL)
      |SELECT p.col_name, p.n_rows, p.n_nulls, p.ndv,
      |  CAST(m.mcv_rank AS INTEGER) AS mcv_rank,
      |  m.value AS mcv_value, m.cnt AS mcv_count
      |FROM per_col p LEFT JOIN mcv m
      |  ON p.col_name = m.col_name AND m.mcv_rank <= 3
      |ORDER BY p.col_name, mcv_rank NULLS LAST""".stripMargin

  /** q176 — exact Gini split search ([[graft.ops.SplitSearch]]) for
    * "will this lineitem be returned?" over the l_quantity feature: one
    * candidate-threshold row with left/right class counts and the
    * weighted-Gini ranking fraction in DECIMAL(38,0) (gated as STRING,
    * the q98 convention — no IEEE division in the contract). */
  def q176GiniSplit(spark: SparkSession, dir: String): DataFrame =
    SplitSearch.giniSplitTable(
        Tables.lineitem(spark, dir)
          .select(col("l_quantity"),
            (col("l_returnflag") === "R").as("is_returned")),
        "l_quantity", "is_returned")
      .select(col("threshold"), col("n_l"), col("pos_l"),
        col("n_r"), col("pos_r"),
        col("gini_num").cast("string").as("gini_num"),
        col("gini_den").cast("string").as("gini_den"))
      .orderBy(col("threshold"))

  val q176Sql: String =
    """WITH pv AS (
      |  SELECT CAST(trunc(l_quantity) AS BIGINT) AS v, count(*) AS n_v,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pos_v
      |  FROM lineitem GROUP BY v),
      |cum AS (
      |  SELECT v,
      |    CAST(sum(n_v) OVER (ORDER BY v) AS HUGEINT) AS n_l,
      |    CAST(sum(pos_v) OVER (ORDER BY v) AS HUGEINT) AS pos_l
      |  FROM pv),
      |tot AS (
      |  SELECT CAST(sum(n_v) AS HUGEINT) AS n,
      |    CAST(sum(pos_v) AS HUGEINT) AS pos FROM pv)
      |SELECT v AS threshold,
      |  CAST(n_l AS BIGINT) AS n_l, CAST(pos_l AS BIGINT) AS pos_l,
      |  CAST(n - n_l AS BIGINT) AS n_r,
      |  CAST(pos - pos_l AS BIGINT) AS pos_r,
      |  CAST(CAST(
      |    (pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l)) * (n - n_l)
      |    + ((pos - pos_l) * (pos - pos_l)
      |       + ((n - n_l) - (pos - pos_l)) * ((n - n_l) - (pos - pos_l)))
      |      * n_l AS DECIMAL(38,0)) AS VARCHAR) AS gini_num,
      |  CAST(CAST(n_l * (n - n_l) AS DECIMAL(38,0)) AS VARCHAR) AS gini_den
      |FROM cum, tot
      |WHERE n_l < n
      |ORDER BY threshold""".stripMargin

  /** q177 — distinct l-diversity release audit
    * ([[graft.ops.Privacy.lDiversityAudit]]) of customer over the q135
    * quasi-identifiers, sensitive attribute = the account-balance
    * hundred-band: per QI group its size, attained l, and the l ≥ 3
    * verdict — the homogeneity check k-anonymity cannot see. */
  def q177LDiversity(spark: SparkSession, dir: String): DataFrame =
    Privacy.lDiversityAudit(
        Tables.customer(spark, dir)
          .select(col("c_mktsegment"), col("c_nationkey"),
            floor(col("c_acctbal") / 100).cast("long").as("band")),
        Seq("c_mktsegment", "c_nationkey"), "band", l = 3L)
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  val q177Sql: String =
    """WITH b AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(floor(c_acctbal / 100) AS BIGINT) AS band
      |  FROM customer),
      |g AS (
      |  SELECT c_mktsegment, c_nationkey, band, count(*) AS cnt
      |  FROM b GROUP BY c_mktsegment, c_nationkey, band)
      |SELECT c_mktsegment, c_nationkey,
      |  CAST(sum(cnt) AS BIGINT) AS group_size,
      |  count(band) AS l_distinct,
      |  count(band) >= 3 AS diverse
      |FROM g GROUP BY c_mktsegment, c_nationkey
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** The q29/q34 query-vector convention: a plan-time all-0.1f literal. */
  private val pqQueryVec: Seq[Float] = Seq.fill(64)(0.1f)

  /** q178 — product-quantization ADC top-10 ([[graft.ops.Pq]]): 64-dim
    * vectors → 4 subspaces × 16-code sampled codebook (the 16 lowest-id
    * vectors, deterministic), nearest-centroid encode, asymmetric
    * distances folded in subspace order (IEEE-bit-stable on any
    * partitioning). The oracle replays codebook, encode and ADC in SQL —
    * approximate SEARCH, exactly CHECKABLE, like q29's probed-bucket
    * contract. */
  def q178PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cb = Pq.sampledCodebook(emb, "vec_id", "embedding", dim = 64, m = 4, k = 16)
    val codes = Pq.encode(emb, "vec_id", "embedding", cb, dim = 64, m = 4)
    Pq.adcTopK(codes, "vec_id", cb, pqQueryVec, dim = 64, m = 4, k = 10)
  }

  val q178Sql: String =
    """WITH seeds AS (
      |  SELECT embedding,
      |    row_number() OVER (ORDER BY vec_id) - 1 AS code_id
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        ORDER BY vec_id LIMIT 16)),
      |ms AS (SELECT unnest(range(4)) AS m),
      |cb AS (
      |  SELECT m, code_id,
      |    list_slice(embedding, m * 16 + 1, m * 16 + 16) AS codevec
      |  FROM seeds, ms),
      |sv AS (
      |  SELECT vec_id, m,
      |    list_slice(embedding, m * 16 + 1, m * 16 + 16) AS sub
      |  FROM embeddings, ms),
      |enc AS (
      |  SELECT vec_id, sv.m, cb.code_id,
      |    list_sum(list_transform(range(16), i ->
      |      (CAST(sub[i+1] AS DOUBLE) - CAST(codevec[i+1] AS DOUBLE))
      |      * (CAST(sub[i+1] AS DOUBLE) - CAST(codevec[i+1] AS DOUBLE))))
      |      AS dist
      |  FROM sv JOIN cb ON sv.m = cb.m),
      |codes AS (
      |  SELECT vec_id, m, code_id FROM (
      |    SELECT vec_id, m, code_id, row_number() OVER (
      |        PARTITION BY vec_id, m ORDER BY dist, code_id) AS rn
      |    FROM enc) WHERE rn = 1),
      |qd AS (
      |  SELECT m, code_id,
      |    list_sum(list_transform(range(16), i ->
      |      (CAST(CAST(0.1 AS FLOAT) AS DOUBLE)
      |         - CAST(codevec[i+1] AS DOUBLE))
      |      * (CAST(CAST(0.1 AS FLOAT) AS DOUBLE)
      |         - CAST(codevec[i+1] AS DOUBLE)))) AS qdist
      |  FROM cb),
      |adc AS (
      |  SELECT vec_id, list_sum(list(qdist ORDER BY m)) AS adc_dist
      |  FROM codes JOIN qd USING (m, code_id)
      |  GROUP BY vec_id)
      |SELECT vec_id, adc_dist FROM adc
      |ORDER BY adc_dist, vec_id
      |LIMIT 10""".stripMargin

  /** q179 — local clustering coefficient census
    * ([[graft.ops.Triangles.clusteringCoefficients]]): for every doc of
    * near-dup degree ≥ 2, the exact (triangles, wedges) pair — the
    * clique-vs-chain verdict per document that q174's global census
    * aggregates away. No IEEE division: the coefficient stays a
    * rational. */
  def q179ClusteringCoeff(spark: SparkSession, dir: String): DataFrame =
    Triangles.clusteringCoefficients(PairStore.nearDupPairs(spark, dir))
      .select(col("id").as("doc_id"), col("degree"),
        col("n_triangles"), col("n_wedges"))
      .orderBy(col("doc_id"))

  val q179Sql: String =
    "WITH pairs AS (\n" + ExtQueries.q26Sql + "\n),\n" +
      """e AS (SELECT id_a, id_b FROM pairs),
        |ends AS (
        |  SELECT id_a AS id FROM e
        |  UNION ALL SELECT id_b FROM e),
        |deg AS (SELECT id, count(*) AS degree FROM ends GROUP BY id),
        |tri AS (
        |  SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c
        |  FROM e p1
        |  JOIN e p2 ON p2.id_a = p1.id_b
        |  JOIN e p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b),
        |tends AS (
        |  SELECT a AS id FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri),
        |tcount AS (SELECT id, count(*) AS n_triangles FROM tends GROUP BY id)
        |SELECT d.id AS doc_id, d.degree,
        |  COALESCE(t.n_triangles, 0) AS n_triangles,
        |  CAST(d.degree * (d.degree - 1) / 2 AS BIGINT) AS n_wedges
        |FROM deg d LEFT JOIN tcount t ON t.id = d.id
        |WHERE d.degree >= 2
        |ORDER BY doc_id""".stripMargin

  /** q180 — ALL-features Gini split search in one pass
    * ([[graft.ops.SplitSearch.giniSplitTableMulti]]): quantity, discount
    * and tax (the latter two centi-binned) evaluated from ONE stacked
    * aggregate — the per-feature prefix windows partition by feature, so
    * no global window exists at any feature count. Same DECIMAL(38,0)
    * ranking contract as q176. */
  def q180MultiSplit(spark: SparkSession, dir: String): DataFrame =
    SplitSearch.giniSplitTableMulti(
        Tables.lineitem(spark, dir)
          .select(col("l_quantity"), col("l_discount"), col("l_tax"),
            (col("l_returnflag") === "R").as("is_returned")),
        Seq(
          "quantity" -> col("l_quantity"),
          "discount_c" -> (col("l_discount") * 100),
          "tax_c" -> (col("l_tax") * 100)),
        "is_returned")
      .select(col("feature"), col("threshold"), col("n_l"), col("pos_l"),
        col("n_r"), col("pos_r"),
        col("gini_num").cast("string").as("gini_num"),
        col("gini_den").cast("string").as("gini_den"))
      .orderBy(col("feature"), col("threshold"))

  val q180Sql: String =
    """WITH stacked AS (
      |  SELECT 'quantity' AS feature, CAST(trunc(l_quantity) AS BIGINT) AS v,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'discount_c', CAST(trunc(l_discount * 100) AS BIGINT),
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'tax_c', CAST(trunc(l_tax * 100) AS BIGINT),
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
      |  FROM lineitem),
      |pv AS (
      |  SELECT feature, v, count(*) AS n_v,
      |    CAST(sum(pos) AS BIGINT) AS pos_v
      |  FROM stacked GROUP BY feature, v),
      |cum AS (
      |  SELECT feature, v,
      |    CAST(sum(n_v) OVER (PARTITION BY feature ORDER BY v)
      |      AS HUGEINT) AS n_l,
      |    CAST(sum(pos_v) OVER (PARTITION BY feature ORDER BY v)
      |      AS HUGEINT) AS pos_l
      |  FROM pv),
      |tot AS (
      |  SELECT feature, CAST(sum(n_v) AS HUGEINT) AS n,
      |    CAST(sum(pos_v) AS HUGEINT) AS pos
      |  FROM pv GROUP BY feature)
      |SELECT cum.feature, v AS threshold,
      |  CAST(n_l AS BIGINT) AS n_l, CAST(pos_l AS BIGINT) AS pos_l,
      |  CAST(n - n_l AS BIGINT) AS n_r,
      |  CAST(pos - pos_l AS BIGINT) AS pos_r,
      |  CAST(CAST(
      |    (pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l)) * (n - n_l)
      |    + ((pos - pos_l) * (pos - pos_l)
      |       + ((n - n_l) - (pos - pos_l)) * ((n - n_l) - (pos - pos_l)))
      |      * n_l AS DECIMAL(38,0)) AS VARCHAR) AS gini_num,
      |  CAST(CAST(n_l * (n - n_l) AS DECIMAL(38,0)) AS VARCHAR) AS gini_den
      |FROM cum JOIN tot ON tot.feature = cum.feature
      |WHERE n_l < n
      |ORDER BY cum.feature, threshold""".stripMargin

  /** q182 — IVF-PQ search ([[graft.ops.Pq.ivfPqTopK]], the IndexIVFPQ
    * shape): the coarse quantizer (8 lowest-id centroids) routes the
    * query to its 2 nearest cells, only those cells' vectors reach the
    * PQ encode, and candidates rank by ADC — the ANN arc's last stage
    * (brute q28 → LSH q29 → IVF q85 → PQ q178 → IVF-PQ). The contract is
    * "exact ADC top-k of the probed cells": the oracle replays routing,
    * assignment, encode and ADC, so both pruning and ranking are
    * hash-checked. */
  def q182IvfPq(spark: SparkSession, dir: String): DataFrame =
    Pq.ivfPqTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
      pqQueryVec, dim = 64, m = 4, codebookK = 16, nCells = 8,
      nProbe = 2, k = 10)

  val q182Sql: String =
    """WITH cents AS (
      |  SELECT embedding AS centvec,
      |    row_number() OVER (ORDER BY vec_id) - 1 AS cell_id
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        ORDER BY vec_id LIMIT 8)),
      |probed AS (
      |  SELECT cell_id FROM (
      |    SELECT cell_id,
      |      row_number() OVER (ORDER BY qcd, cell_id) AS prank
      |    FROM (
      |      SELECT cell_id,
      |        list_sum(list_transform(range(64), i ->
      |          (CAST(CAST(0.1 AS FLOAT) AS DOUBLE)
      |             - CAST(centvec[i+1] AS DOUBLE))
      |          * (CAST(CAST(0.1 AS FLOAT) AS DOUBLE)
      |             - CAST(centvec[i+1] AS DOUBLE)))) AS qcd
      |      FROM cents))
      |  WHERE prank <= 2),
      |assigned AS (
      |  SELECT vec_id, cell_id FROM (
      |    SELECT e.vec_id, c.cell_id,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_sum(list_transform(range(64), i ->
      |          (CAST(e.embedding[i+1] AS DOUBLE)
      |             - CAST(c.centvec[i+1] AS DOUBLE))
      |          * (CAST(e.embedding[i+1] AS DOUBLE)
      |             - CAST(c.centvec[i+1] AS DOUBLE)))), c.cell_id) AS rn
      |    FROM embeddings e, cents c)
      |  WHERE rn = 1),
      |cand AS (
      |  SELECT vec_id FROM assigned JOIN probed USING (cell_id)),
      |seeds AS (
      |  SELECT embedding,
      |    row_number() OVER (ORDER BY vec_id) - 1 AS code_id
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        ORDER BY vec_id LIMIT 16)),
      |ms AS (SELECT unnest(range(4)) AS m),
      |cb AS (
      |  SELECT m, code_id,
      |    list_slice(embedding, m * 16 + 1, m * 16 + 16) AS codevec
      |  FROM seeds, ms),
      |sv AS (
      |  SELECT e.vec_id, m,
      |    list_slice(e.embedding, m * 16 + 1, m * 16 + 16) AS sub
      |  FROM embeddings e JOIN cand USING (vec_id), ms),
      |enc AS (
      |  SELECT vec_id, sv.m, cb.code_id,
      |    list_sum(list_transform(range(16), i ->
      |      (CAST(sub[i+1] AS DOUBLE) - CAST(codevec[i+1] AS DOUBLE))
      |      * (CAST(sub[i+1] AS DOUBLE) - CAST(codevec[i+1] AS DOUBLE))))
      |      AS dist
      |  FROM sv JOIN cb ON sv.m = cb.m),
      |codes AS (
      |  SELECT vec_id, m, code_id FROM (
      |    SELECT vec_id, m, code_id, row_number() OVER (
      |        PARTITION BY vec_id, m ORDER BY dist, code_id) AS rn
      |    FROM enc) WHERE rn = 1),
      |qd AS (
      |  SELECT m, code_id,
      |    list_sum(list_transform(range(16), i ->
      |      (CAST(CAST(0.1 AS FLOAT) AS DOUBLE)
      |         - CAST(codevec[i+1] AS DOUBLE))
      |      * (CAST(CAST(0.1 AS FLOAT) AS DOUBLE)
      |         - CAST(codevec[i+1] AS DOUBLE)))) AS qdist
      |  FROM cb),
      |adc AS (
      |  SELECT vec_id, list_sum(list(qdist ORDER BY m)) AS adc_dist
      |  FROM codes JOIN qd USING (m, code_id)
      |  GROUP BY vec_id)
      |SELECT vec_id, adc_dist FROM adc
      |ORDER BY adc_dist, vec_id
      |LIMIT 10""".stripMargin

  /** q183 — RESIDUAL IVF-PQ ([[graft.ops.Pq.ivfPqResidualTopK]], the
    * FAISS by_residual=true default): PQ quantizes `vec − centroid`
    * (tighter distribution → less loss for the same code budget), one
    * shared residual codebook, and a PER-CELL query lookup table —
    * still nCells·M·K doubles of broadcast metadata. Every subtraction
    * chain folds in declared order, so the oracle replays routing,
    * residuals, encode and per-cell ADC bit-exactly. */
  def q183IvfPqResidual(spark: SparkSession, dir: String): DataFrame =
    Pq.ivfPqResidualTopK(Tables.embeddings(spark, dir), "vec_id",
      "embedding", pqQueryVec, dim = 64, m = 4, codebookK = 16,
      nCells = 8, nProbe = 2, k = 10)

  val q183Sql: String =
    """WITH cents AS (
      |  SELECT embedding AS centvec,
      |    row_number() OVER (ORDER BY vec_id) - 1 AS cell_id
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        ORDER BY vec_id LIMIT 8)),
      |probed AS (
      |  SELECT cell_id FROM (
      |    SELECT cell_id,
      |      row_number() OVER (ORDER BY qcd, cell_id) AS prank
      |    FROM (
      |      SELECT cell_id,
      |        list_sum(list_transform(range(64), i ->
      |          (CAST(CAST(0.1 AS FLOAT) AS DOUBLE)
      |             - CAST(centvec[i+1] AS DOUBLE))
      |          * (CAST(CAST(0.1 AS FLOAT) AS DOUBLE)
      |             - CAST(centvec[i+1] AS DOUBLE)))) AS qcd
      |      FROM cents))
      |  WHERE prank <= 2),
      |assigned AS (
      |  SELECT vec_id, cell_id FROM (
      |    SELECT e.vec_id, c.cell_id,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_sum(list_transform(range(64), i ->
      |          (CAST(e.embedding[i+1] AS DOUBLE)
      |             - CAST(c.centvec[i+1] AS DOUBLE))
      |          * (CAST(e.embedding[i+1] AS DOUBLE)
      |             - CAST(c.centvec[i+1] AS DOUBLE)))), c.cell_id) AS rn
      |    FROM embeddings e, cents c)
      |  WHERE rn = 1),
      |resid AS (
      |  SELECT a.vec_id, a.cell_id,
      |    list_transform(range(64), i ->
      |      CAST(e.embedding[i+1] AS DOUBLE)
      |        - CAST(c.centvec[i+1] AS DOUBLE)) AS resid
      |  FROM assigned a
      |  JOIN embeddings e USING (vec_id)
      |  JOIN cents c USING (cell_id)),
      |seeds AS (
      |  SELECT resid, row_number() OVER (ORDER BY vec_id) - 1 AS code_id
      |  FROM (SELECT vec_id, resid FROM resid ORDER BY vec_id LIMIT 16)),
      |ms AS (SELECT unnest(range(4)) AS m),
      |cb AS (
      |  SELECT m, code_id,
      |    list_slice(resid, m * 16 + 1, m * 16 + 16) AS codevec
      |  FROM seeds, ms),
      |sv AS (
      |  SELECT r.vec_id, r.cell_id, m,
      |    list_slice(r.resid, m * 16 + 1, m * 16 + 16) AS sub
      |  FROM resid r JOIN probed USING (cell_id), ms),
      |enc AS (
      |  SELECT vec_id, cell_id, sv.m, cb.code_id,
      |    list_sum(list_transform(range(16), i ->
      |      (sub[i+1] - codevec[i+1]) * (sub[i+1] - codevec[i+1])))
      |      AS dist
      |  FROM sv JOIN cb ON sv.m = cb.m),
      |codes AS (
      |  SELECT vec_id, cell_id, m, code_id FROM (
      |    SELECT vec_id, cell_id, m, code_id, row_number() OVER (
      |        PARTITION BY vec_id, m ORDER BY dist, code_id) AS rn
      |    FROM enc) WHERE rn = 1),
      |qd AS (
      |  SELECT c.cell_id, cb.m, cb.code_id,
      |    list_sum(list_transform(range(16), i ->
      |      ((CAST(CAST(0.1 AS FLOAT) AS DOUBLE)
      |          - CAST(c.centvec[cb.m * 16 + i + 1] AS DOUBLE))
      |         - cb.codevec[i+1])
      |      * ((CAST(CAST(0.1 AS FLOAT) AS DOUBLE)
      |          - CAST(c.centvec[cb.m * 16 + i + 1] AS DOUBLE))
      |         - cb.codevec[i+1]))) AS qdist
      |  FROM cents c, cb),
      |adc AS (
      |  SELECT vec_id, list_sum(list(qdist ORDER BY m)) AS adc_dist
      |  FROM codes JOIN qd USING (cell_id, m, code_id)
      |  GROUP BY vec_id)
      |SELECT vec_id, adc_dist FROM adc
      |ORDER BY adc_dist, vec_id
      |LIMIT 10""".stripMargin

  /** q184 — largest-remainder budget apportionment
    * ([[graft.ops.Sampling.largestRemainderAllocation]], Hamilton
    * method): a 1000-document sample budget split across sources
    * proportionally to their corpus share, floor seats by exact integer
    * division, the leftover seats to the largest remainders (ties to
    * the first source by name) — the allocation step upstream of q41's
    * fixed per-stratum quotas, in arithmetic both engines replay
    * exactly. */
  def q184SeatAllocation(spark: SparkSession, dir: String): DataFrame =
    Sampling.largestRemainderAllocation(
        Tables.documents(spark, dir), "source", budget = 1000L)
      .orderBy(col("source"))

  val q184Sql: String =
    """WITH s AS (
      |  SELECT source, count(*) AS n_rows FROM documents
      |  WHERE source IS NOT NULL GROUP BY source),
      |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM s),
      |f AS (
      |  SELECT source, n_rows,
      |    CAST((1000 * n_rows) // n_total AS BIGINT) AS floor_seats,
      |    CAST((1000 * n_rows) % n_total AS BIGINT) AS remainder_num
      |  FROM s, t),
      |l AS (SELECT CAST(1000 - sum(floor_seats) AS BIGINT) AS leftover
      |      FROM f),
      |r AS (
      |  SELECT *, row_number() OVER (
      |      ORDER BY remainder_num DESC, source) AS rem_rank
      |  FROM f)
      |SELECT source, n_rows, floor_seats, remainder_num,
      |  CAST(floor_seats + CASE WHEN rem_rank <= leftover
      |       THEN 1 ELSE 0 END AS BIGINT) AS seats
      |FROM r, l
      |ORDER BY source""".stripMargin

  /** q185 — join-cardinality estimation audit ([[graft.ops.CardEst]]):
    * the Selinger uniform estimate n_l·n_r / max(ndv) NEXT TO the exact
    * cardinality for an FK join (orders⋈customer — containment holds,
    * estimate exact) and a skewed self-join (events⋈events on user_id —
    * the under-estimate MCVs exist to fix). The engine never
    * materializes a join: exact = Σ_k c_l(k)·c_r(k) over NDV-sized
    * key-count tables; the oracle counts the brute row-level JOIN — an
    * independent proof of the product-sum identity. Completes the CBO
    * arc: q173 histogram → q175 stats → q185 estimation-vs-reality. */
  def q185CardAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    CardEst.joinSizeAudit("events_self_user", ev, "user_id", ev, "user_id")
      .unionByName(CardEst.joinSizeAudit("orders_customer_fk",
        Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"))
      .orderBy(col("join_name"))
  }

  val q185Sql: String =
    """WITH eu AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
      |es AS (
      |  SELECT count(*) AS n, count(DISTINCT user_id) AS ndv FROM eu),
      |ea AS (
      |  SELECT count(*) AS actual
      |  FROM eu a JOIN eu b ON a.user_id = b.user_id),
      |oc AS (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL),
      |cc AS (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL),
      |os AS (
      |  SELECT count(*) AS n, count(DISTINCT o_custkey) AS ndv FROM oc),
      |cs AS (
      |  SELECT count(*) AS n, count(DISTINCT c_custkey) AS ndv FROM cc),
      |oa AS (
      |  SELECT count(*) AS actual
      |  FROM oc JOIN cc ON o_custkey = c_custkey)
      |SELECT 'events_self_user' AS join_name,
      |  es.n AS n_left, es.n AS n_right,
      |  es.ndv AS ndv_left, es.ndv AS ndv_right,
      |  CAST((es.n * es.n) // greatest(es.ndv, es.ndv) AS BIGINT)
      |    AS est_rows,
      |  CAST(ea.actual AS BIGINT) AS actual_rows
      |FROM es, ea
      |UNION ALL
      |SELECT 'orders_customer_fk',
      |  os.n, cs.n, os.ndv, cs.ndv,
      |  CAST((os.n * cs.n) // greatest(os.ndv, cs.ndv) AS BIGINT),
      |  CAST(oa.actual AS BIGINT)
      |FROM os, cs, oa
      |ORDER BY join_name""".stripMargin

  /** q186 — skew advisor ([[graft.ops.Skew.skewAdvisor]]): which
    * o_orderstatus keys exceed their fair share n/ndv (cross-multiplied
    * integers, no division) and how many salt buckets each needs —
    * the decision input to [[graft.ops.Skew.saltedAggregate]]/
    * [[graft.ops.Skew.saltedJoin]] (q99's treatments). TPC-H order
    * status is structurally skewed: F and O carry ~48.6% each over 3
    * keys, P ~2.7%. */
  def q186SkewAdvisor(spark: SparkSession, dir: String): DataFrame =
    Skew.skewAdvisor(Tables.orders(spark, dir), "o_orderstatus",
        hotFactor = 1L)
      .orderBy(col("o_orderstatus"))

  val q186Sql: String =
    """WITH f AS (
      |  SELECT o_orderstatus, count(*) AS freq
      |  FROM orders WHERE o_orderstatus IS NOT NULL
      |  GROUP BY o_orderstatus),
      |t AS (SELECT CAST(sum(freq) AS BIGINT) AS n, count(*) AS ndv FROM f)
      |SELECT o_orderstatus, freq,
      |  CAST((freq * ndv + n - 1) // n AS BIGINT) AS salt_buckets
      |FROM f, t
      |WHERE freq * ndv > n
      |ORDER BY o_orderstatus""".stripMargin

  /** q187 — EXACT ROC-AUC ([[graft.ops.Auc]], Mann-Whitney with
    * midranks): does extended price order returned lineitems above kept
    * ones? One hash aggregate to (score, n, pos) value groups, the
    * two-phase distributed prefix scan for "items before" (never a
    * global window), and a DECIMAL(38,0) numerator/denominator pair —
    * zero floating point in the contract. The single-scalar summary of
    * the ordering q171's lift table shows per decile. */
  def q187ExactAuc(spark: SparkSession, dir: String): DataFrame =
    Auc.exactAuc(Tables.lineitem(spark, dir),
      col("l_extendedprice"), col("l_returnflag") === "R")

  val q187Sql: String =
    """WITH g AS (
      |  SELECT l_extendedprice AS s, count(*) AS n_g,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pos_g
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
      |  GROUP BY s),
      |r AS (
      |  SELECT *, CAST(coalesce(sum(n_g) OVER (ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS HUGEINT) AS before_g
      |  FROM g),
      |t AS (
      |  SELECT CAST(sum(pos_g) AS HUGEINT) AS n_pos,
      |    CAST(sum(n_g) - sum(pos_g) AS HUGEINT) AS n_neg,
      |    CAST(sum(CAST(pos_g AS HUGEINT) * (before_g * 2 + n_g + 1))
      |      AS HUGEINT) AS two_rank_sum
      |  FROM r)
      |SELECT CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(n_neg AS BIGINT) AS n_neg,
      |  CAST(CAST(two_rank_sum - n_pos * (n_pos + 1) AS DECIMAL(38,0))
      |    AS VARCHAR) AS auc_num,
      |  CAST(CAST(n_pos * n_neg * 2 AS DECIMAL(38,0)) AS VARCHAR)
      |    AS auc_den
      |FROM t""".stripMargin

  /** q188 — probe over the STORED residual IVF-PQ index
    * ([[graft.ops.PqStore]]): q183's geometry persisted as a real
    * artifact — centroids + frozen codebook + codes partitioned by
    * cell — and the query answered from the stored codes alone
    * (partition-pruned scan, no assignment/encode at probe time). The
    * gate is the equivalence contract itself: the stored-index probe
    * must reproduce q183's in-query answer row for row, so it shares
    * q183's oracle verbatim. Index build is once per source fingerprint
    * (the q34 BucketedAnn discipline); the bench pre-builds it and
    * times the steady-state probe. */
  def q188StoredIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.ops.PqStore.ensureIndex(spark, dir)
    graft.ops.PqStore.probeTopK(spark, root, pqQueryVec, nProbe = 2,
      k = 10)
  }

  /** Same answer as q183 by construction — the stored index is the
    * in-query pipeline's materialization. */
  val q188Sql: String = q183Sql

  /** q189 — ADVISOR-DRIVEN salted aggregation
    * ([[graft.ops.Skew.advisedAggregate]]): q186's verdicts wired to
    * q99's treatment — every o_orderstatus key the advisor flags hot
    * (F and O, ~48.6% each) aggregates over its own recommended bucket
    * count, tolerable keys (P) take the plain path, and the result is
    * provably the plain GROUP BY (that plain GROUP BY is the oracle).
    * The advice table is hot-keys-only and broadcasts. */
  def q189AdvisedSaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Skew.advisedAggregate(Tables.orders(spark, dir), "o_orderstatus",
        hotFactor = 1L,
        aggs = scala.collection.immutable.ListMap(
          "n" -> Skew.countAll,
          "sum_price" -> Skew.sumOf(
            col("o_totalprice").cast("decimal(18,2)")),
          "max_price" -> Skew.maxOf(col("o_totalprice"))))
      .withColumn("sum_price", col("sum_price").cast("double"))
      .orderBy(col("o_orderstatus"))

  val q189Sql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  max(o_totalprice) AS max_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** q193 — exact grouped OLS fit ([[graft.ops.Ols.groupedFit]]):
    * slope/intercept of line-value cents over quantity per return flag,
    * as exact integer rationals (num/den DECIMAL(38,0) strings — the
    * q187 contract). One map-side-combinable aggregate of five
    * sufficient statistics; the DuckDB twin mirrors every product in
    * HUGEINT. Completes the supervised-stats arc: q176/q180 split
    * search, q187 ranking quality, q193 linear fit. */
  def q193OlsFit(spark: SparkSession, dir: String): DataFrame =
    Ols.groupedFit(Tables.lineitem(spark, dir),
        col("l_returnflag"),
        col("l_quantity"),
        round(col("l_extendedprice") * 100))
      .withColumnRenamed("g", "l_returnflag")
      .orderBy(col("l_returnflag"))

  val q193Sql: String =
    """WITH b AS (
      |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      |a AS (
      |  SELECT g, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM b GROUP BY g)
      |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
      |  CAST(CAST(n*sxy - sx*sy AS DECIMAL(38,0)) AS VARCHAR)
      |    AS slope_num,
      |  CAST(CAST(n*sxx - sx*sx AS DECIMAL(38,0)) AS VARCHAR)
      |    AS slope_den,
      |  CAST(CAST(sy*(n*sxx - sx*sx) - (n*sxy - sx*sy)*sx
      |    AS DECIMAL(38,0)) AS VARCHAR) AS icpt_num,
      |  CAST(CAST(n*(n*sxx - sx*sx) AS DECIMAL(38,0)) AS VARCHAR)
      |    AS icpt_den
      |FROM a ORDER BY l_returnflag""".stripMargin

  /** q199 — EXACT calibration table + Brier components: per predicted-
    * probability bin (discount in basis points, the "score"), the count
    * and positive count (reliability diagram) plus the bin's squared-
    * error mass Σ(p_bp − y·10⁴)² in DECIMAL(38,0) — the global Brier
    * score is Σ sq_err_num / (n·10⁸), assembled from exact integers by
    * the caller. Completes the eval family: q187 ranking (AUC), q193
    * fit (OLS), q199 calibration. One map-side-combinable aggregate;
    * both engines do the identical integer arithmetic. */
  def q199Calibration(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_discount").isNotNull && col("l_returnflag").isNotNull)
      .select(round(col("l_discount") * 10000).cast("long").as("p_bp"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .groupBy(col("p_bp"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        sum(((col("p_bp") - col("y") * 10000L) *
          (col("p_bp") - col("y") * 10000L)).cast("decimal(38,0)"))
          .cast("decimal(38,0)").cast("string").as("sq_err_num"))
      .orderBy(col("p_bp"))

  val q199Sql: String =
    """WITH b AS (
      |  SELECT CAST(round(l_discount * 10000) AS BIGINT) AS p_bp,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem
      |  WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL)
      |SELECT p_bp, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
      |  CAST(CAST(sum(CAST((p_bp - y*10000) * (p_bp - y*10000)
      |    AS HUGEINT)) AS DECIMAL(38,0)) AS VARCHAR) AS sq_err_num
      |FROM b GROUP BY p_bp ORDER BY p_bp""".stripMargin
}
