package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Cluster, FeatureHash, Privacy}

/**
 * q135-q138 — the governance-and-graph tier: privacy auditing, stateless
 * vectorization, deletion-cascade planning, and local graph centrality —
 * the compliance/observability operations a production corpus warehouse
 * runs beside its analytics. Reference scope: extends the LLM-pipeline
 * surface the builder brief names; the trends reference (trends.go) has
 * no equivalent.
 */
object GovernanceQueries {

  /** q135 — k-anonymity audit ([[graft.ops.Privacy]], Sweeney 2002) of
    * customer over the quasi-identifier pair (mktsegment, nationkey) at
    * k = 5, reported per segment: rows, QI groups, attained k (the
    * minimum group size), and sub-k groups/rows. Two hash aggregates,
    * the second over the already-tiny group table; all-integer. */
  def q135KAnonymity(spark: SparkSession, dir: String): DataFrame =
    Privacy.kAnonymityAudit(Tables.customer(spark, dir),
        Seq("c_mktsegment", "c_nationkey"), "c_mktsegment", k = 5L)
      .orderBy(col("c_mktsegment"))

  val q135Sql: String =
    """WITH g AS (
      |  SELECT c_mktsegment, c_nationkey, count(*) AS gs
      |  FROM customer GROUP BY 1, 2)
      |SELECT c_mktsegment,
      |  CAST(sum(gs) AS BIGINT) AS n_rows,
      |  count(*) AS n_groups,
      |  min(gs) AS min_group_size,
      |  CAST(sum(CASE WHEN gs < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_risky_groups,
      |  CAST(sum(CASE WHEN gs < 5 THEN gs ELSE 0 END) AS BIGINT)
      |    AS n_risky_rows
      |FROM g
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q136 — hashing-trick source signatures ([[graft.ops.FeatureHash]],
    * Weinberger et al. '09): 16-dim signed-hash vectors per source —
    * every component an exact integer sum under the engine-portable
    * 48-bit md5 hash — then the pairwise source cosine matrix (integer
    * dot/norms, two sqrt + one division at the end). The
    * vocabulary-free "which sources look alike" signal. */
  def q136FeatureHashCosine(spark: SparkSession, dir: String): DataFrame = {
    val vecs = FeatureHash.hashedGroupVectors(
      Tables.documents(spark, dir), "source", "text", dim = 16)
    FeatureHash.cosineMatrix(vecs, "source", dim = 16)
      .select(col("g_a").as("source_a"), col("g_b").as("source_b"),
        col("cos_sim"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val q136Sql: String = {
    val dim = 16
    val slots = (0 until dim).map(j =>
      s"""coalesce(sum(CASE WHEN h % $dim = $j THEN
         |      CASE WHEN (h // $dim) % 2 = 0 THEN 1 ELSE -1 END END), 0)
         |      AS s$j""".stripMargin).mkString(",\n    ")
    def dot(x: String, y: String) =
      (0 until dim).map(j => s"$x.s$j * $y.s$j").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT source,
       |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
       |  FROM documents),
       |h AS (
       |  SELECT source,
       |    CAST(concat('0x', substr(md5(t), 1, 12)) AS BIGINT) AS h
       |  FROM tok),
       |v AS (
       |  SELECT source,
       |    $slots
       |  FROM h GROUP BY source)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST(${dot("a", "b")} AS DOUBLE)
       |    / (sqrt(CAST(${dot("a", "a")} AS DOUBLE))
       |       * sqrt(CAST(${dot("b", "b")} AS DOUBLE))) AS cos_sim
       |FROM v a JOIN v b ON a.source < b.source
       |ORDER BY source_a, source_b""".stripMargin
  }

  /** q137 — deletion-cascade audit (the GDPR erasure planning pass):
    * given the deny-set `c_acctbal < 100`, count per nation the
    * customers, orders and line items a cascade would erase plus the
    * affected revenue (decimal-exact sum, final cast). The deny set is
    * ~10% of customers (acctbal is uniform), so neither it nor the
    * cascaded order set is hinted broadcast — both scale with the fact
    * tables, and AQE's runtime statistics pick the join strategies; only
    * the 25-row nation dim carries an explicit hint. */
  def q137DeletionCascade(spark: SparkSession, dir: String): DataFrame = {
    val deny = Tables.customer(spark, dir)
      .filter(col("c_acctbal") < 100.0)
      .select(col("c_custkey"), col("c_nationkey"))
    val ordersD = Tables.orders(spark, dir)
      .join(deny, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    val liAgg = Tables.lineitem(spark, dir)
      .join(ordersD, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_lineitems"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue_affected"))
    deny.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .join(ordersD.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders")), Seq("c_nationkey"), "left_outer")
      .join(liAgg, Seq("c_nationkey"), "left_outer")
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_customers"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_lineitems"), lit(0L)).as("n_lineitems"),
        coalesce(col("revenue_affected"), lit(0.0)).as("revenue_affected"))
      .orderBy(col("n_name"))
  }

  val q137Sql: String =
    """WITH deny AS (
      |  SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal < 100.0),
      |od AS (
      |  SELECT o_orderkey, c_nationkey
      |  FROM orders JOIN deny ON o_custkey = c_custkey),
      |li AS (
      |  SELECT c_nationkey, count(*) AS n_lineitems,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS revenue_affected
      |  FROM lineitem JOIN od ON l_orderkey = o_orderkey
      |  GROUP BY c_nationkey),
      |dc AS (
      |  SELECT c_nationkey, count(*) AS n_customers
      |  FROM deny GROUP BY c_nationkey),
      |oc AS (
      |  SELECT c_nationkey, count(*) AS n_orders
      |  FROM od GROUP BY c_nationkey)
      |SELECT n_name, n_customers,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(n_lineitems, 0) AS n_lineitems,
      |  coalesce(revenue_affected, 0.0) AS revenue_affected
      |FROM dc
      |LEFT JOIN oc USING (c_nationkey)
      |LEFT JOIN li USING (c_nationkey)
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY n_name""".stripMargin

  /** q138 — two-hop reach census ([[Cluster.twoHopCensus]]) over the
    * q26 near-dup graph: per node, exact distinct-neighbor count and
    * exact distance-2 count — the integer-gateable local-centrality
    * signal (iterative float centralities can't cross the hash gate).
    * Oracle: the same census via independent SQL joins over the
    * brute-force pair scan. */
  def q138TwoHopCensus(spark: SparkSession, dir: String): DataFrame = {
    val pairs = PairStore.nearDupPairs(spark, dir)
    Cluster.twoHopCensus(pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("n1"), col("n2"))
      .orderBy(col("doc_id"))
  }

  val q138Sql: String =
    """WITH sh AS (
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
      |  SELECT id_a AS s, id_b AS d FROM pairs
      |  UNION
      |  SELECT id_b, id_a FROM pairs),
      |deg AS (SELECT s, count(*) AS n1 FROM edges GROUP BY s),
      |tp AS (
      |  SELECT DISTINCT e1.s, e2.d AS f
      |  FROM edges e1 JOIN edges e2 ON e1.d = e2.s
      |  WHERE e2.d <> e1.s),
      |x2 AS (
      |  SELECT tp.s, count(*) AS n2
      |  FROM tp LEFT JOIN edges e ON tp.s = e.s AND tp.f = e.d
      |  WHERE e.s IS NULL
      |  GROUP BY tp.s)
      |SELECT deg.s AS doc_id, deg.n1, coalesce(x2.n2, 0) AS n2
      |FROM deg LEFT JOIN x2 ON deg.s = x2.s
      |ORDER BY doc_id""".stripMargin

  /** q142 — majority-label propagation over the near-dup graph (weak
    * supervision's label-spreading step): every doc in the pair graph
    * takes the MAJORITY label among its labeled neighbors (labels come
    * from the embeddings table, vec_id ≡ doc_id; ties pinned to the
    * LOWEST label via struct-max). One vote aggregate + one argmax —
    * integer votes, so the assignment hash-gates exactly where an
    * iterative float label-spread could not. Pair engine via the shared
    * [[PairStore]]. */
  def q142LabelPropagation(spark: SparkSession, dir: String): DataFrame = {
    val pairs = PairStore.nearDupPairs(spark, dir)
    val edges = pairs.select(col("id_a").as("doc_id"), col("id_b").as("nbr"))
      .unionByName(pairs.select(col("id_b").as("doc_id"),
        col("id_a").as("nbr")))
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("nbr"), col("label"))
    edges.join(labels, "nbr")
      .groupBy(col("doc_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("doc_id"))
      .agg(sum(col("votes")).cast("long").as("n_labeled_neighbors"),
        max(struct(col("votes").as("v"), (-col("label")).as("neg")))
          .as("best"))
      .select(col("doc_id"), (-col("best.neg")).as("predicted_label"),
        col("best.v").as("n_votes"), col("n_labeled_neighbors"))
      .orderBy(col("doc_id"))
  }

  val q142Sql: String =
    """WITH sh AS (
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
      |  SELECT id_a AS doc_id, id_b AS nbr FROM pairs
      |  UNION ALL
      |  SELECT id_b, id_a FROM pairs),
      |votes AS (
      |  SELECT e.doc_id, l.label, count(*) AS v
      |  FROM edges e JOIN embeddings l ON e.nbr = l.vec_id
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT doc_id, label, v,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY v DESC, label) AS rn,
      |    CAST(sum(v) OVER (PARTITION BY doc_id) AS BIGINT) AS total
      |  FROM votes)
      |SELECT doc_id, CAST(label AS INTEGER) AS predicted_label,
      |  v AS n_votes, total AS n_labeled_neighbors
      |FROM ranked WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** q143 — exact two-sample Kolmogorov-Smirnov drift statistic
    * ([[graft.ops.Drift]]) between the src0 and src1 document-length
    * distributions: D·n₁·n₂ = max |F₁(x)·n₂ − F₂(x)·n₁| in integer
    * arithmetic, one final division. See the op for the bounded-domain
    * window argument. */
  def q143KsDrift(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Drift.ksDrift(Tables.documents(spark, dir),
        "source", "n_chars", "src0", "src1")
      .orderBy(col("n1"))

  val q143Sql: String =
    """WITH d AS (
      |  SELECT source, n_chars FROM documents
      |  WHERE source IN ('src0', 'src1')),
      |counts AS (
      |  SELECT n_chars,
      |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c1,
      |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c2
      |  FROM d GROUP BY n_chars),
      |cum AS (
      |  SELECT n_chars,
      |    CAST(sum(c1) OVER (ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS f1,
      |    CAST(sum(c2) OVER (ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS f2
      |  FROM counts),
      |totals AS (
      |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
      |  FROM counts)
      |SELECT n1, n2,
      |  CAST(CAST(max(abs(CAST(f1 AS HUGEINT) * n2
      |      - CAST(f2 AS HUGEINT) * n1)) AS DECIMAL(38,0))
      |    AS VARCHAR) AS ks_scaled,
      |  CAST(max(abs(CAST(f1 AS HUGEINT) * n2
      |      - CAST(f2 AS HUGEINT) * n1)) AS DOUBLE)
      |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks
      |FROM cum CROSS JOIN totals
      |GROUP BY n1, n2
      |ORDER BY n1""".stripMargin

  /** q155 — per-node triangle census over the near-dup graph: exact
    * triangle membership counts (the local clustering signal — a node in
    * many triangles sits inside a DENSE duplication pocket, not a chain
    * of borderline pairs). Edges come from the shared [[PairStore]];
    * triangles enumerate canonically (a < b < c) as wedge-join +
    * closing-edge semi-check — two hash joins on the pair table, never
    * a cube. Every count integer; oracle recomputes from the
    * brute-force pair scan. */
  def q155TriangleCensus(spark: SparkSession, dir: String): DataFrame = {
    val pairs = PairStore.nearDupPairs(spark, dir)
      .select(col("id_a"), col("id_b"))
    val wedges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .join(pairs.select(col("id_a").as("b"), col("id_b").as("c")), "b")
    val tri = wedges.join(
      pairs.select(col("id_a").as("a"), col("id_b").as("c")),
      Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("doc_id"))
  }

  val q155Sql: String =
    """WITH sh AS (
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
      |tri AS (
      |  SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
      |  FROM pairs e1
      |  JOIN pairs e2 ON e1.id_b = e2.id_a
      |  JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
      |nodes AS (
      |  SELECT a AS doc_id FROM tri
      |  UNION ALL SELECT b FROM tri
      |  UNION ALL SELECT c FROM tri)
      |SELECT doc_id, count(*) AS n_triangles
      |FROM nodes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q163 — all-pairs KS drift matrix ([[graft.ops.Drift.ksDriftMatrix]])
    * over every source's document-length distribution: the
    * find-the-odd-crawl-out monitor, 190 exact statistics from ONE
    * dense (source × length) CDF grid + a value-keyed self-join —
    * never a per-pair scan of the data. Integer to the final
    * division. */
  def q163KsMatrix(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Drift.ksDriftMatrix(Tables.documents(spark, dir),
        "source", "n_chars")
      .orderBy(col("g_a"), col("g_b"))

  val q163Sql: String =
    """WITH counts AS (
      |  SELECT source AS g, n_chars AS v, count(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |grid AS (
      |  SELECT g, v FROM (SELECT DISTINCT g FROM counts)
      |  CROSS JOIN (SELECT DISTINCT v FROM counts)),
      |cdf AS (
      |  SELECT grid.g, grid.v,
      |    CAST(sum(coalesce(c, 0)) OVER (PARTITION BY grid.g
      |      ORDER BY grid.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS f,
      |    CAST(sum(coalesce(c, 0)) OVER (PARTITION BY grid.g)
      |      AS BIGINT) AS n
      |  FROM grid LEFT JOIN counts
      |    ON grid.g = counts.g AND grid.v = counts.v)
      |SELECT a.g AS g_a, b.g AS g_b,
      |  max(a.n) AS n_a, max(b.n) AS n_b,
      |  CAST(CAST(max(abs(CAST(a.f AS HUGEINT) * b.n
      |      - CAST(b.f AS HUGEINT) * a.n)) AS DECIMAL(38,0))
      |    AS VARCHAR) AS ks_scaled,
      |  CAST(max(abs(CAST(a.f AS HUGEINT) * b.n
      |      - CAST(b.f AS HUGEINT) * a.n)) AS DOUBLE)
      |    / (CAST(max(a.n) AS DOUBLE) * CAST(max(b.n) AS DOUBLE)) AS ks
      |FROM cdf a JOIN cdf b ON a.v = b.v AND a.g < b.g
      |GROUP BY 1, 2
      |ORDER BY g_a, g_b""".stripMargin
}
