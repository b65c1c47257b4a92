package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.ops.{Checksum, Scd, Sessionize, SetSimJoin, Skew}

/**
 * Round-5 second widening: the warehouse-operations surface — CUBE,
 * mergeable-sketch reaggregation, RANGE-frame windows, session path
 * mining, exact prefix-filtered set-similarity join, order-independent
 * table checksums, skew-proof salted aggregation, declared-domain
 * histograms. Every query oracle-gated (DuckDB twin on the same parquet).
 */
object WarehouseQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q93 — CUBE over (returnflag, linestatus): all four grouping
    * combinations from ONE Expand + hash aggregate pass (completes the
    * grouping family next to q48 ROLLUP / q72 GROUPING SETS). DECIMAL
    * sums; grouping_id pins which subtotal each row is. */
  def q93CubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))

  val q93Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin

  /** q94 — mergeable-sketch reaggregation: per-DAY HLL sketches of
    * distinct users are UNIONED into weekly estimates — the pattern that
    * lets a 100 TB warehouse answer "weekly uniques" from kilobyte daily
    * partials instead of rescanning raw events (sketch union is exactly
    * what exact distinct counts cannot do: they don't merge). Gated the
    * q58 way: the output carries the EXACT weekly count plus a boolean
    * asserting the merged estimate landed within 5 % (integer-exact
    * comparison: |est − exact|·20 ≤ exact), and the oracle states the
    * exact count and TRUE — sketch drift fails the round. */
  def q94HllMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week_start"),
        to_date(col("ts")).as("day"))
    val daily = ev.groupBy(col("week_start"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val weekly = daily.groupBy(col("week_start"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = ev.groupBy(col("week_start"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(weekly, "week_start")
      .select(col("week_start"), col("exact_users"),
        (abs(col("est") - col("exact_users")) * 20 <= col("exact_users"))
          .as("approx_ok"))
      .orderBy(col("week_start"))
  }

  val q94Sql: String =
    """SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
      |  count(DISTINCT user_id) AS exact_users,
      |  TRUE AS approx_ok
      |FROM events
      |GROUP BY 1
      |ORDER BY week_start""".stripMargin

  /** q95 — RANGE-frame trailing window: per-user trailing-7-day value sum
    * over the daily aggregate, frame defined by the ORDER-BY VALUE
    * (`rangeBetween`), not row offsets — gaps in the calendar shrink the
    * frame, which ROWS BETWEEN cannot express and q89's expansion trick
    * does not need to: the whole op is one shuffle + one sort, zero row
    * multiplication. DECIMAL day sums keep the frame sum order-free. */
  def q95RangeWindow(spark: SparkSession, dir: String): DataFrame = {
    // one user_id partitioning serves BOTH the (user_id, day) aggregate
    // (subset-clustering rule) and the per-user window — no second shuffle
    val daily = Tables.events(spark, dir)
      .repartition(col("user_id"))
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(dec(col("value"))).as("day_val"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
    val trail = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
      .rangeBetween(-6, 0)
    daily.select(col("user_id"), col("day"),
        col("day_val").cast(DoubleType).as("day_value"),
        sum(col("day_val")).over(trail).cast(DoubleType).as("trail7"))
      .orderBy(col("user_id"), col("day"))
  }

  val q95Sql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    sum(CAST(value AS DECIMAL(18,2))) AS day_val
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id, day,
      |  CAST(day_val AS DOUBLE) AS day_value,
      |  CAST(sum(day_val) OVER (
      |    PARTITION BY user_id
      |    ORDER BY date_diff('day', DATE '1970-01-01', day)
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail7
      |FROM daily
      |ORDER BY user_id, day""".stripMargin

  /** q96 — session path mining ([[graft.ops.Sessionize.eventSessions]]):
    * label events with 30-min-gap sessions, extract each session's ordered
    * event-type path (capped at 10 steps; ties broken by event_id so the
    * sequence is total), count sessions per path. The "what do users DO"
    * query every product-analytics warehouse runs; one key shuffle for the
    * labeling + one hash agg for the census. */
  def q96SessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val labeled = Sessionize.eventSessions(Tables.events(spark, dir),
      "user_id", "ts", gapMinutes = 30, tieCol = "event_id")
    labeled
      .groupBy(col("user_id"), col("session_seq"))
      .agg(array_join(
        slice(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          e => e.getField("event_type")), 1, 10), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
  }

  val q96Sql: String =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |lab AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(CASE WHEN prev IS NULL
      |             OR epoch_us(ts) - epoch_us(prev) > 1800000000
      |        THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM ordered),
      |paths AS (
      |  SELECT user_id, session_seq,
      |    array_to_string(
      |      (list(event_type ORDER BY ts, event_id))[1:10], '>') AS path
      |  FROM lab GROUP BY user_id, session_seq)
      |SELECT path, count(*) AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path""".stripMargin

  /** q97 — EXACT set-similarity self-join ([[graft.ops.SetSimJoin]]):
    * every document pair whose 3-word-shingle sets have Jaccard ≥ 0.6,
    * found by rarest-first prefix filtering — the deterministic complement
    * to q26's MinHash (no recall contract: completeness is a theorem, and
    * the brute-force oracle checks it on this corpus). */
  def q97SetSimJoin(spark: SparkSession, dir: String): DataFrame = {
    // tokens are the HASHES of the 3-word shingles (fused native
    // ngram_hashes): Jaccard over the hashed sets equals Jaccard over the
    // string sets modulo 64-bit collisions (the q25/q26 convention the
    // string-side DuckDB oracle checks), and every downstream set op —
    // dfreq, prefix join, verify intersect — runs on primitive longs
    // instead of string arrays (tokenization measured 4× the join cost)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.ops.Dedup.shingleHashes(col("text"), 3).as("shingles"))
    SetSimJoin.prefixJaccardJoin(docs, "doc_id", "shingles",
        thetaNum = 6, thetaDen = 10)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q97Sql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |    x -> x <> '') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      |    ELSE list_transform(range(len(w) - 2),
      |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) END) AS toks
      |  FROM t)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      |    AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.toks, b.toks)) * 10 >=
      |  (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) * 6
      |ORDER BY id_a, id_b""".stripMargin

  /** q98 — order-independent table checksum ([[graft.ops.Checksum]]): per
    * source, row count + exact DECIMAL sum of 48-bit md5 row digests. The
    * copy-verification primitive: compare two tables in O(groups) with one
    * hash aggregate each, no sort — commutative addition makes the result
    * independent of row order and partitioning, which is the whole point
    * at 100 TB. */
  def q98TableChecksum(spark: SparkSession, dir: String): DataFrame =
    Checksum.tableChecksum(Tables.documents(spark, dir),
        Seq("source"),
        Seq(col("doc_id"), col("lang"), col("n_chars"), col("text")))
      // gate as a STRING: sums exceed 2^53, and both the pandas bridge and
      // parquet→float paths silently round big decimals — digits don't
      .withColumn("checksum", col("checksum").cast("string"))
      .orderBy(col("source"))

  val q98Sql: String =
    """WITH canon AS (
      |  SELECT source,
      |    CASE WHEN doc_id IS NULL THEN 'N'
      |         ELSE length(CAST(doc_id AS VARCHAR)) || ':'
      |              || CAST(doc_id AS VARCHAR) END AS c1,
      |    CASE WHEN lang IS NULL THEN 'N'
      |         ELSE length(lang) || ':' || lang END AS c2,
      |    CASE WHEN n_chars IS NULL THEN 'N'
      |         ELSE length(CAST(n_chars AS VARCHAR)) || ':'
      |              || CAST(n_chars AS VARCHAR) END AS c3,
      |    CASE WHEN text IS NULL THEN 'N'
      |         ELSE length(text) || ':' || text END AS c4
      |  FROM documents)
      |SELECT source, count(*) AS n_rows,
      |  CAST(CAST(sum(CAST(CAST(concat('0x',
      |      substr(md5(c1 || '|' || c2 || '|' || c3 || '|' || c4), 1, 12))
      |    AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR)
      |    AS checksum
      |FROM canon
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** q99 — skew-proof salted aggregation ([[graft.ops.Skew]]): the
    * two-phase (key, salt) partial → key merge plan whose result is
    * PROVABLY the plain groupBy (that plain groupBy IS the oracle).
    * Five event types over 10⁵ rows is exactly the mega-key shape that
    * serializes five reducers unsalted; algebraic partials make the salt
    * assignment irrelevant to the answer. */
  def q99SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedAggregate(Tables.events(spark, dir), col("event_type"),
        buckets = 32,
        aggs = scala.collection.immutable.ListMap(
          "n" -> Skew.countAll,
          "sum_value" -> Skew.sumOf(dec(col("value"))),
          "max_value" -> Skew.maxOf(col("value"))))
      .withColumn("sum_value", col("sum_value").cast(DoubleType))
      .orderBy(col("event_type"))

  val q99Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  max(value) AS max_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q100 — declared-domain equi-width histogram: value binned into
    * [0,50) buckets per event type, counts + bin extrema — the profiling
    * primitive behind every data-quality dashboard. Map-only binning into
    * one hash aggregate; the declared domain means NO discovery pass over
    * the data (the q61 pivot convention). */
  def q100Histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("bin", floor(col("value") / 50).cast("long"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("bin_min"),
        max(col("value")).as("bin_max"))
      .orderBy(col("event_type"), col("bin"))

  val q100Sql: String =
    """SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bin,
      |  count(*) AS n, min(value) AS bin_min, max(value) AS bin_max
      |FROM events
      |GROUP BY event_type, bin
      |ORDER BY event_type, bin""".stripMargin

  /** q101 — SCD Type 2 dimension build ([[graft.ops.Scd.scd2]]): the
    * per-user event-type change stream compressed into validity intervals
    * (valid_from inclusive, valid_to exclusive, null = current), with
    * same-state runs collapsed — the standard warehouse dimension-history
    * shape. One key shuffle; the run-detect and interval-close windows
    * share a single (user | ts, event_id) sort. (user_id, ts) is
    * collision-free in this corpus, so (user_id, valid_from) totalizes
    * the output order.*/
  def q101Scd2(spark: SparkSession, dir: String): DataFrame =
    Scd.scd2(Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
        "user_id", "ts", "event_type", "event_id")
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from"))

  val q101Sql: String =
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS rn
      |  FROM events),
      |runs AS (
      |  SELECT user_id, ts, event_id, event_type FROM o
      |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
      |iv AS (
      |  SELECT user_id, event_type, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS valid_to
      |  FROM runs)
      |SELECT user_id, event_type, valid_from, valid_to,
      |  valid_to IS NULL AS is_current
      |FROM iv
      |ORDER BY user_id, valid_from""".stripMargin

  /** q102 — snapshot diff ([[graft.ops.Scd.snapshotDiff]]): two versions
    * of the documents table reduced to an insert/update/delete changelog
    * by comparing 48-bit row digests in ONE full outer join — O(1) row
    * compare regardless of width, the inverse of q86's changelog MERGE.
    * The after-side is synthesized in-query from arithmetic on doc_id
    * (the q56/q84 convention: both engines build the identical snapshot;
    * the gate exercises the diff, not the synthesizer). */
  def q102SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val before = docs.select(col("doc_id"), col("source"), col("text"))
    val after = docs
      .filter(col("doc_id") % 7 =!= 0) // deletes
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text")) // updates
      .unionByName(docs.filter(col("doc_id") % 11 === 0) // inserts
        .select((col("doc_id") + 10000000L).as("doc_id"), col("source"),
          col("text")))
    Scd.snapshotDiff(before, after, "doc_id", Seq("source", "text"))
      .select(col("doc_id"), col("op"), col("source"))
      .orderBy(col("doc_id"), col("op"))
  }

  val q102Sql: String =
    """WITH before_t AS (
      |  SELECT doc_id, source, text FROM documents),
      |after_t AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 10000000, source, text
      |  FROM documents WHERE doc_id % 11 = 0)
      |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |  CASE WHEN b.doc_id IS NULL THEN 'insert'
      |       WHEN a.doc_id IS NULL THEN 'delete'
      |       WHEN a.text <> b.text OR a.source <> b.source THEN 'update'
      |  END AS op,
      |  a.source AS source
      |FROM after_t a FULL OUTER JOIN before_t b USING (doc_id)
      |WHERE b.doc_id IS NULL OR a.doc_id IS NULL
      |   OR a.text <> b.text OR a.source <> b.source
      |ORDER BY doc_id, op""".stripMargin

  /** q103 — correlated-scalar-subquery shape: customers whose total order
    * spend exceeds their nation's average customer spend. Decorrelated
    * into one aggregate + one window over nation — no per-row subquery
    * execution, the optimizer-friendly form of the classic SQL pattern.
    * The average is stated as CAST(sum AS DOUBLE)/n on BOTH sides (engine
    * AVG() return types differ on DECIMAL; a stated division does not). */
  def q103AboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("total"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val byNation = Window.partitionBy(col("c_nationkey"))
    cust.join(totals, col("c_custkey") === col("o_custkey"))
      .withColumn("nation_avg",
        (sum(col("total")).over(byNation).cast(DoubleType) /
          count(lit(1)).over(byNation)))
      .filter(col("total").cast(DoubleType) > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"),
        col("total").cast(DoubleType).as("total"), col("nation_avg"))
      .orderBy(col("c_custkey"))
  }

  val q103Sql: String =
    """WITH totals AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      |  FROM orders GROUP BY o_custkey),
      |j AS (
      |  SELECT c_custkey, c_nationkey, total,
      |    CAST(sum(total) OVER (PARTITION BY c_nationkey) AS DOUBLE) /
      |      count(*) OVER (PARTITION BY c_nationkey) AS nation_avg
      |  FROM customer JOIN totals ON c_custkey = o_custkey)
      |SELECT c_custkey, c_nationkey, CAST(total AS DOUBLE) AS total,
      |  nation_avg
      |FROM j
      |WHERE CAST(total AS DOUBLE) > nation_avg
      |ORDER BY c_custkey""".stripMargin

  /** q104 — deterministic EWMA (α = 1/2) of each user's daily value
    * series: the fold runs over the SORTED day array with the first day
    * as seed, so every output is a FIXED sequence of IEEE multiply-by-0.5
    * and add — bit-reproducible across engines (the q74/q88 discipline
    * applied to a sequential recurrence, which no order-free aggregate
    * can express). Spark `aggregate` over `sort_array(collect_list)` ≙
    * DuckDB `list_reduce(list(... ORDER BY day))` — both seed from the
    * first element. One key shuffle, arrays bounded by the day span. */
  def q104Ewma(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(dec(col("value"))).cast(DoubleType).as("x"))
    daily.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("xs"))
      .select(col("user_id"), size(col("xs")).cast("long").as("n_days"),
        aggregate(
          slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
          element_at(col("xs"), 1).getField("x"),
          (acc, e) => acc * 0.5 + e.getField("x") * 0.5).as("ewma"))
      .orderBy(col("user_id"))
  }

  val q104Sql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_days,
      |  list_reduce(list(x ORDER BY day), (acc, x) -> acc * 0.5 + x * 0.5)
      |    AS ewma
      |FROM daily
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q105 — the NATIVE as-of operator ([[graft.plans.NativeAsof]]): the
    * tier-(c) Catalyst extension (custom LogicalPlan + planner Strategy +
    * physical sort-merge exec) doing the q42 semantics in one O(L+R)
    * merge per partition — no union, no window state, no row expansion.
    * Oracle = DuckDB's native ASOF LEFT JOIN, a third independent
    * implementation of the same semantics. */
  def q105NativeAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("value"))
    graft.plans.NativeAsof.asofJoin(clicks, purchases, "user_id", "ts",
        Seq("value"))
      .select(col("event_id"), col("user_id"), col("asof_value"))
      .orderBy(col("event_id"))
  }

  val q105Sql: String =
    """WITH c AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, p.value AS asof_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  /** q106 — PMI-style term co-occurrence ([[graft.ops.Cooccurrence]]):
    * document-level collocations ranked by the exact rational
    * N·n_xy / (n_x·n_y) — log-free (log is monotone, the RANKING is
    * identical) so real association scores survive the cross-engine hash
    * gate; the SET complement of q91's sequential bigram statistics. */
  def q106PmiPairs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Cooccurrence.pmiPairs(Tables.documents(spark, dir),
        "doc_id", "text", minTermLen = 5, minPairDocs = 60)
      .orderBy(col("score").desc, col("t1"), col("t2"))

  val q106Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'),
      |    x -> length(x) >= 5))) AS term
      |  FROM documents),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |dfreq AS (SELECT term, count(*) AS n_t FROM tok GROUP BY term),
      |pairs AS (
      |  SELECT a.term AS t1, b.term AS t2, count(*) AS n_xy
      |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.term < b.term
      |  GROUP BY 1, 2 HAVING count(*) >= 60)
      |SELECT t1, t2, n_xy, dx.n_t AS n_x, dy.n_t AS n_y,
      |  CAST(n.n_docs * n_xy AS DOUBLE) / (dx.n_t * dy.n_t) AS score
      |FROM pairs
      |JOIN dfreq dx ON dx.term = t1
      |JOIN dfreq dy ON dy.term = t2
      |CROSS JOIN n
      |ORDER BY score DESC, t1, t2""".stripMargin

  /** q107 — the native as-of operator's FORWARD direction: each click
    * picks up the user's NEXT error event value (the time-to-failure /
    * next-action primitive). Same [[graft.plans.AsofJoinExec]] merge with
    * time walked descending; oracle = DuckDB ASOF on negated epochs (the
    * q65 convention). */
  def q107NativeAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("value"))
    graft.plans.NativeAsof.asofJoinForward(clicks, errors, "user_id", "ts",
        Seq("value"))
      .select(col("event_id"), col("user_id"), col("asof_value"))
      .orderBy(col("event_id"))
  }

  val q107Sql: String =
    """WITH c AS (
      |  SELECT event_id, user_id,
      |    -epoch_us(CAST(ts AS TIMESTAMP)) AS nt
      |  FROM events WHERE event_type = 'click'),
      |e AS (
      |  SELECT user_id, -epoch_us(CAST(ts AS TIMESTAMP)) AS nt,
      |    MAX(value) AS value
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, e.value AS asof_value
      |FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.nt >= e.nt
      |ORDER BY c.event_id""".stripMargin

  /** q108 — entity resolution end to end: q75's blocked edit-distance
    * pairs (dist ≤ 2, the "same entity, typo'd" band) closed into
    * clusters by q43's skew-safe label propagation, reported as the
    * cluster census a master-data pipeline reviews (component id,
    * member count, canonical = lexicographic-min name). Composition of
    * two gated operators; oracle = blocked Levenshtein + an independent
    * recursive-CTE closure (components here are typo clusters — a few
    * members each — so full reachability recursion is tractable where
    * q43's mega-clusters needed the iterative runner). */
  def q108EntityResolution(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir).select(col("p_partkey"), col("p_name"))
    // VALUE-COLLAPSED plan (q75's discipline applied to graph building):
    // connectivity is NAME-determined — ids sharing a name are pairwise
    // dist-0 edges — so the component graph collapses to one node per
    // distinct name (representative = min id, so component ids equal the
    // row-level ones), with a self-loop keeping duplicated-but-isolated
    // names in the census. Membership counts multiply back (Σ n per
    // component). Row-level edges here are Σ multiplicity² — quadratic.
    val names = parts.groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("nid"), count(lit(1)).as("c"))
    val namePairs = graft.ops.StringSim.editDistanceNamePairs(parts,
      "p_partkey", "p_name", maxDist = 2)
    val edges = namePairs.select(col("id_a"), col("id_b"))
      .unionByName(names.filter(col("c") >= 2)
        .select(col("nid").as("id_a"), col("nid").as("id_b")))
    graft.ops.Cluster.connectedComponents(edges, "id_a", "id_b")
      .join(names, col("node") === col("nid"))
      .groupBy(col("component"))
      .agg(sum(col("c")).cast("long").as("n_members"),
        min(col("p_name")).as("canonical_name"))
      .orderBy(col("component"))
  }

  val q108Sql: String =
    s"""WITH RECURSIVE ${QualityQueries.wordDropPairsCte},
      |pairs AS (
      |  SELECT id_a, id_b FROM cand
      |  WHERE levenshtein(s_a, s_b) <= 2),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION
      |  SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT src AS node, dst AS r FROM edges
      |  UNION
      |  SELECT rr.node, e.dst FROM reach rr JOIN edges e ON rr.r = e.src),
      |comp AS (
      |  SELECT node, least(node, min(r)) AS component
      |  FROM reach GROUP BY node)
      |SELECT component, count(*) AS n_members, min(p.p_name)
      |  AS canonical_name
      |FROM comp JOIN p ON p.p_partkey = comp.node
      |GROUP BY component
      |ORDER BY component""".stripMargin

  /** q109 — robust outlier profile (median + MAD): the q55 exact-rank
    * discipline applied twice — per-type lower median of `value`, then
    * lower median of |value − med|, then an exact outlier count at the
    * 3·MAD fence. Every double is the same IEEE subtract/compare in both
    * engines, so even the robust-statistics fence is hash-gated. Two
    * sorts on the same (type | value-ish) key; no sketch, no
    * approximation. */
  def q109RobustOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
    val byType = Window.partitionBy(col("event_type"))
    val medians = ev
      .withColumn("rn", row_number().over(
        byType.orderBy(col("value"), col("event_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byType))
      .groupBy(col("event_type"))
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("value")))
        .as("med"))
    val dev = ev.join(medians, "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mads = dev
      .withColumn("rn", row_number().over(
        byType.orderBy(col("dev"), col("event_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byType))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(col("med")).as("med"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("dev")))
          .as("mad"))
    // dev feeds BOTH the MAD rank pass and the fence count, and mads
    // feeds two joins of the final plan — stage both so the scan, the
    // median join and the MAD sort each run exactly once, not once per
    // consumer (the shared-subtree recompute behind q109's r7 drift)
    graft.ops.CacheScope.withStages(dev, mads) {
      graft.ops.CacheScope.pin(dev
        .join(mads.select(col("event_type"), col("mad")), "event_type")
        .groupBy(col("event_type"))
        .agg(count(when(col("dev") > col("mad") * 3, lit(1)))
          .as("n_outliers"))
        .join(mads, "event_type")
        .select(col("event_type"), col("n"), col("med"), col("mad"),
          col("n_outliers"))
        .orderBy(col("event_type")))
    }
  }

  /** q110 — INTERPOLATED percentiles (SQL-standard percentile_cont
    * semantics) per event type: pos = (n−1)·p held as the exact integer
    * pair (pos div den, pos mod den), the two bracketing order statistics
    * selected by exact rank (q55 discipline), then ONE fixed IEEE
    * interpolation v_lo + frac·(v_hi − v_lo) — the continuous complement
    * to q55's lower-rank selection, hash-gated because both engines run
    * the identical stated arithmetic (neither engine's own
    * percentile_cont/quantile_cont is trusted). */
  def q110PercentileCont(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
    val byType = Window.partitionBy(col("event_type"))
    val ranked = ev
      .withColumn("rn", row_number().over(
        byType.orderBy(col("value"), col("event_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byType))
    def cont(p: Int, den: Int, alias: String): Column = {
      // pos = (n-1)*p/den; lo = 1 + pos div den (1-based), frac = (pos mod den)/den
      val posNum = (col("n") - 1) * p
      val lo = expr(s"1 + CAST(((n - 1) * $p) DIV $den AS BIGINT)")
      val fracNum = posNum % den
      val vLo = max(when(col("rn") === lo, col("value")))
      val vHi = max(when(col("rn") === lo + 1, col("value")))
      val frac = max(fracNum).cast("double") / den
      (vLo + frac * (coalesce(vHi, vLo) - vLo)).as(alias)
    }
    ranked.groupBy(col("event_type"))
      .agg(cont(50, 100, "p50"), cont(90, 100, "p90"), cont(99, 100, "p99"))
      .orderBy(col("event_type"))
  }

  val q110Sql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type,
      |  max(CASE WHEN rn = 1 + ((n-1) * 50) // 100 THEN value END)
      |    + (CAST(max(((n-1) * 50) % 100) AS DOUBLE) / 100) *
      |      (coalesce(max(CASE WHEN rn = 2 + ((n-1) * 50) // 100 THEN value END),
      |                max(CASE WHEN rn = 1 + ((n-1) * 50) // 100 THEN value END))
      |       - max(CASE WHEN rn = 1 + ((n-1) * 50) // 100 THEN value END)) AS p50,
      |  max(CASE WHEN rn = 1 + ((n-1) * 90) // 100 THEN value END)
      |    + (CAST(max(((n-1) * 90) % 100) AS DOUBLE) / 100) *
      |      (coalesce(max(CASE WHEN rn = 2 + ((n-1) * 90) // 100 THEN value END),
      |                max(CASE WHEN rn = 1 + ((n-1) * 90) // 100 THEN value END))
      |       - max(CASE WHEN rn = 1 + ((n-1) * 90) // 100 THEN value END)) AS p90,
      |  max(CASE WHEN rn = 1 + ((n-1) * 99) // 100 THEN value END)
      |    + (CAST(max(((n-1) * 99) % 100) AS DOUBLE) / 100) *
      |      (coalesce(max(CASE WHEN rn = 2 + ((n-1) * 99) // 100 THEN value END),
      |                max(CASE WHEN rn = 1 + ((n-1) * 99) // 100 THEN value END))
      |       - max(CASE WHEN rn = 1 + ((n-1) * 99) // 100 THEN value END)) AS p99
      |FROM r
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q111 — multi-source reconciliation: when the same doc arrives from
    * several sources, keep exactly one copy chosen by declared source
    * priority, ties broken by doc_id — the struct-max argmax (A3
    * discipline) applied to the "which copy wins" decision every
    * multi-feed warehouse makes. Duplicate keys are synthesized in-query
    * (doc_id div 3 collapses neighbors into one logical entity — both
    * engines build the identical multi-source view). */
  def q111SourceReconcile(spark: SparkSession, dir: String): DataFrame = {
    val prio = when(col("source").isin("src0", "src1", "src2"), 3)
      .when(col("source").isin("src3", "src4", "src5"), 2)
      .otherwise(1)
    Tables.documents(spark, dir)
      .select(expr("doc_id DIV 3").as("entity_id"),
        col("doc_id"), col("source"), prio.as("prio"))
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_copies"),
        max(struct(col("prio"), col("doc_id"), col("source"))).as("w"))
      .select(col("entity_id"), col("n_copies"),
        col("w.doc_id").as("kept_doc"), col("w.source").as("kept_source"),
        col("w.prio").as("kept_prio"))
      .orderBy(col("entity_id"))
  }

  val q111Sql: String =
    """WITH v AS (
      |  SELECT doc_id // 3 AS entity_id, doc_id, source,
      |    CASE WHEN source IN ('src0','src1','src2') THEN 3
      |         WHEN source IN ('src3','src4','src5') THEN 2
      |         ELSE 1 END AS prio
      |  FROM documents),
      |r AS (
      |  SELECT entity_id, doc_id, source, prio,
      |    row_number() OVER (PARTITION BY entity_id
      |      ORDER BY prio DESC, doc_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY entity_id) AS n_copies
      |  FROM v)
      |SELECT entity_id, n_copies, prio AS kept_prio, doc_id AS kept_doc,
      |  source AS kept_source
      |FROM r WHERE rn = 1
      |ORDER BY entity_id""".stripMargin

  /** q112 — the bucketed-storage join tier, oracle-gated end to end:
    * orders and lineitem are WRITTEN as bucketed+sorted tables (external,
    * temp-path data; the shuffle paid once at write time), then joined
    * through [[graft.ops.Bucketing.colocatedJoin]] — zero exchange on
    * either side (BucketingSpec asserts the plan; this gate proves the
    * RESULT equals the plain join on the raw parquet). The oracle knows
    * nothing of buckets — it joins the original files, so any bucketing
    * bug (row loss, bucket-pruning error, sort-merge mismatches) breaks
    * the hash. */
  /** One bucket write per (session, sfDir): repeated invocations (bench
    * warmup + passes) reuse the same bucketed tables instead of paying
    * the write each time. Table names carry a per-write token so
    * concurrent sessions sharing a metastore never collide; a JVM
    * shutdown hook drops the catalog entries and deletes the temp data,
    * and any stale `q112_*` residue from a previous session is swept on
    * first use. */
  private val q112Buckets =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def q112WriteBuckets(spark: SparkSession,
                               dir: String): (String, String) = {
    // sweep catalog residue left by crashed sessions (bounded listing)
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("q112_"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    val token = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val tmp = java.nio.file.Files.createTempDirectory("graft-q112").toString
    val oTable = s"q112_orders_$token"
    val lTable = s"q112_lineitem_$token"
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"),
        col("l_discount"))
    orders.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("path", s"$tmp/orders")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(oTable)
    li.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("path", s"$tmp/lineitem")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(lTable)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        spark.sql(s"DROP TABLE IF EXISTS $oTable")
        spark.sql(s"DROP TABLE IF EXISTS $lTable")
      } catch { case _: Throwable => () }
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator()
          .asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists)
      } catch { case _: Throwable => () }
    }))
    (oTable, lTable)
  }

  def q112BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val key = spark.sparkContext.applicationId + "|" + dir
    val (oTable, lTable) = q112Buckets.computeIfAbsent(key,
      _ => q112WriteBuckets(spark, dir))
    graft.ops.Bucketing.colocatedJoin(spark, oTable, lTable,
        "o_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** q113 — event-type transition matrix: Markov-chain estimation over
    * each user's event stream (lead over the (user | ts, event_id) total
    * order, then one hash aggregate); `p` is the exact rational
    * n / row_total emitted through ONE IEEE division — q91's estimation
    * discipline applied to the events stream instead of document text. */
  def q113TransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    steps
      .withColumn("p",
        col("n").cast(DoubleType) / sum(col("n")).over(byFrom))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** q114 — first-touch attribution: each 30-min session is attributed
    * to its FIRST event type (min over the (ts, event_id, type) struct —
    * one aggregate, no second window pass), and per touch type the query
    * reports sessions, converted sessions (≥ 1 purchase) and the
    * conversion rate as one stated IEEE division. The composition of the
    * gated sessionizer with the A3 struct-min argmax — marketing
    * attribution, the query every growth team runs. */
  def q114Attribution(spark: SparkSession, dir: String): DataFrame = {
    val labeled = Sessionize.eventSessions(Tables.events(spark, dir),
      "user_id", "ts", gapMinutes = 30, tieCol = "event_id")
    labeled
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("first_touch"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      .groupBy(col("first_touch"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converted"))
      .withColumn("conv_rate",
        col("n_converted").cast(DoubleType) / col("n_sessions"))
      .orderBy(col("first_touch"))
  }

  /** q116 — bounded-staleness as-of (pandas merge_asof `tolerance`):
    * clicks pick up the latest purchase value only if it happened within
    * the last hour — an out-of-tolerance nearest match yields nulls but
    * keeps the left row. Same single-pass merge; the tolerance check is
    * one long subtraction on the buffered match (the nearest row is the
    * only candidate that can be within bound). Oracle = DuckDB ASOF with
    * the bound stated as a CASE over the epoch difference. */
  def q116AsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("value"))
    graft.plans.NativeAsof.asofJoinTolerance(clicks, purchases,
        "user_id", "ts", Seq("value"), toleranceUs = 3600L * 1000000L)
      .select(col("event_id"), col("user_id"), col("asof_value"))
      .orderBy(col("event_id"))
  }

  val q116Sql: String =
    """WITH c AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id,
      |  CASE WHEN epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
      |       THEN p.value END AS asof_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  /** q117 — NEAREST as-of (pandas merge_asof `direction='nearest'`):
    * each click picks the view event closest in time either direction,
    * equidistant ties pinned to the earlier (backward) row. The native
    * operator does it in the same single ascending merge — the backward
    * candidate is the buffered last-≤ row and the forward candidate is
    * the unconsumed head, so "nearest" costs one extra comparison, not a
    * second pass. Oracle = the composition of DuckDB's backward ASOF and
    * its negated-epoch forward ASOF with the tie-break stated as CASE —
    * a structurally different evaluation of the same semantics. */
  def q117NativeAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("value"))
    graft.plans.NativeAsof.asofJoinNearest(clicks, views, "user_id", "ts",
        Seq("value"))
      .select(col("event_id"), col("user_id"), col("asof_value"))
      .orderBy(col("event_id"))
  }

  val q117Sql: String =
    """WITH c AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click'),
      |v AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |b AS (
      |  SELECT c.event_id, c.user_id, c.ts, v.ts AS bts, v.value AS bval
      |  FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts),
      |cn AS (
      |  SELECT event_id, user_id,
      |    -epoch_us(CAST(ts AS TIMESTAMP)) AS nt
      |  FROM events WHERE event_type = 'click'),
      |vn AS (
      |  SELECT user_id, -epoch_us(CAST(ts AS TIMESTAMP)) AS nt,
      |    MAX(value) AS value
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |f AS (
      |  SELECT cn.event_id, vn.nt AS fnt, vn.value AS fval
      |  FROM cn ASOF LEFT JOIN vn
      |    ON cn.user_id = vn.user_id AND cn.nt >= vn.nt)
      |SELECT b.event_id, b.user_id,
      |  CASE WHEN b.bts IS NOT NULL AND (f.fnt IS NULL
      |         OR epoch_us(b.ts) - epoch_us(b.bts)
      |            <= (-f.fnt) - epoch_us(b.ts))
      |       THEN b.bval
      |       WHEN f.fnt IS NOT NULL THEN f.fval END AS asof_value
      |FROM b JOIN f USING (event_id)
      |ORDER BY b.event_id""".stripMargin

  val q114Sql: String =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |lab AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(CASE WHEN prev IS NULL
      |             OR epoch_us(ts) - epoch_us(prev) > 1800000000
      |        THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM ordered),
      |sess AS (
      |  SELECT user_id, session_seq,
      |    max(CASE WHEN rn = 1 THEN event_type END) AS first_touch,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS converted
      |  FROM (
      |    SELECT user_id, session_seq, event_type,
      |      row_number() OVER (PARTITION BY user_id, session_seq
      |        ORDER BY ts, event_id) AS rn
      |    FROM lab)
      |  GROUP BY user_id, session_seq)
      |SELECT first_touch, count(*) AS n_sessions,
      |  CAST(sum(converted) AS BIGINT) AS n_converted,
      |  CAST(sum(converted) AS DOUBLE) / count(*) AS conv_rate
      |FROM sess
      |GROUP BY first_touch
      |ORDER BY first_touch""".stripMargin

  /** q115 — ordered LISTAGG (SQL:2023 string aggregation): per source,
    * the three smallest doc ids concatenated in order — rank-filter
    * bounds the list BEFORE aggregation (WindowGroupLimit pushes it
    * down), so no group ever buffers unbounded strings; rides Spark 4's
    * SQL surface (`listagg ... WITHIN GROUP`) against DuckDB's
    * `string_agg(... ORDER BY)` — two independent implementations of the
    * standard. */
  def q115OrderedListagg(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("__q115_docs")
    spark.sql(
      """SELECT source,
        |  listagg(doc_id, ',') WITHIN GROUP (ORDER BY doc_id) AS top3_ids
        |FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM __q115_docs)
        |WHERE rn <= 3
        |GROUP BY source
        |ORDER BY source""".stripMargin)
  }

  val q115Sql: String =
    """SELECT source,
      |  string_agg(doc_id, ',' ORDER BY doc_id) AS top3_ids
      |FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 3
      |GROUP BY source
      |ORDER BY source""".stripMargin

  val q113Sql: String =
    """WITH s AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |m AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM s WHERE to_type IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
      |FROM m
      |ORDER BY from_type, to_type""".stripMargin

  val q112Sql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |    AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val q109Sql: String =
    """WITH med AS (
      |  SELECT event_type,
      |    max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
      |  FROM (
      |    SELECT event_type, value,
      |      row_number() OVER (PARTITION BY event_type
      |        ORDER BY value, event_id) AS rn,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |    FROM events)
      |  GROUP BY event_type),
      |dev AS (
      |  SELECT e.event_type, e.event_id, abs(e.value - m.med) AS dev, m.med
      |  FROM events e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, max(n) AS n, max(med) AS med,
      |    max(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad
      |  FROM (
      |    SELECT event_type, dev, med,
      |      row_number() OVER (PARTITION BY event_type
      |        ORDER BY dev, event_id) AS rn,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |    FROM dev)
      |  GROUP BY event_type)
      |SELECT d.event_type, max(m.n) AS n, max(m.med) AS med,
      |  max(m.mad) AS mad,
      |  count(CASE WHEN d.dev > m.mad * 3 THEN 1 END) AS n_outliers
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY d.event_type
      |ORDER BY d.event_type""".stripMargin

  /** q141 — point-in-time ("as was") reconstruction over the q101 SCD2
    * dimension: every user's state at the fixed instant T =
    * 2024-01-15 12:00:00 (interval containing T: valid_from ≤ T <
    * valid_to, open intervals included), rolled up per state with user
    * extremes — the bitemporal read every SCD2 table exists to answer.
    * Plan: the SCD2 build's one key shuffle, then a map-side interval
    * filter + one hash aggregate; T prunes to exactly one row per user
    * active before T. */
  def q141AsWasState(spark: SparkSession, dir: String): DataFrame = {
    // to_timestamp resolves in the SESSION time zone (pinned UTC) — a
    // java.sql.Timestamp literal would parse in the JVM default zone and
    // silently shift T on non-UTC hosts
    val t = to_timestamp(lit("2024-01-15 12:00:00"))
    graft.ops.Scd.scd2(Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
        "user_id", "ts", "event_type", "event_id")
      .filter(col("valid_from") <= t &&
        (col("valid_to").isNull || col("valid_to") > t))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        min(col("user_id")).as("min_user"),
        max(col("user_id")).as("max_user"))
      .orderBy(col("event_type"))
  }

  val q141Sql: String =
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS rn
      |  FROM events),
      |runs AS (
      |  SELECT user_id, ts, event_id, event_type FROM o
      |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
      |iv AS (
      |  SELECT user_id, event_type, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS valid_to
      |  FROM runs)
      |SELECT event_type, count(*) AS n_users,
      |  min(user_id) AS min_user, max(user_id) AS max_user
      |FROM iv
      |WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
      |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 12:00:00')
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}
