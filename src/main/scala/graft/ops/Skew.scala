package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities — the manual path for hot keys beyond what AQE's
 * skew-join splitting handles (AQE splits oversized SHUFFLE partitions, but
 * a single hot GROUP BY key still lands on one reducer, and a broadcast-side
 * explosion needs the salting rewrite).
 *
 * Both transforms are semantics-preserving (SkewSpec proves equality against
 * the unsalted plans); they only change the exchange topology:
 *
 *  - [[saltedAggregate]]: two-phase aggregation — partials on (key, salt)
 *    spread a hot key over `buckets` reducers, then a cheap merge on the key
 *    (the generalization of Spark's own partial aggregation to algebraic
 *    merges the planner can't infer).
 *  - [[saltedJoin]]: the hot LEFT side gets a content-hash salt, the small RIGHT
 *    side is replicated `buckets`× with every salt value, and the join key
 *    becomes (key, salt) — a hot key's rows now hash to `buckets` different
 *    reducers.
 */
object Skew {

  /**
   * DETERMINISTIC row→bucket salt: a hash of ALL of the frame's columns.
   * A nondeterministic salt (`hash(monotonically_increasing_id())`, the
   * obvious choice) is a SPARK-23207-class correctness hazard under
   * partial map-stage recomputation: after a fetch failure the lost map
   * outputs are recomputed, a row can draw a DIFFERENT salt than the
   * copy an already-finished reducer consumed, and the row is dropped or
   * double-counted. Hashing the row's content is stable across replays
   * (same row → same salt, always). Tradeoff, documented: byte-identical
   * duplicate rows share a salt, so a hot key whose rows are ALL
   * identical does not spread — real payloads (ids, timestamps, measures)
   * differ per row, which is what makes the hash spread.
   */
  private def contentSalt(df: DataFrame, buckets: Column): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), buckets)

  /** Aggregation spec: the stage-1 partial over raw rows and the stage-2
    * merge over the named partial column. */
  final case class TwoPhase(partial: Column, merge: String => Column)

  /** sum → sum-of-sums. */
  def sumOf(c: Column): TwoPhase = TwoPhase(sum(c), n => sum(col(n)))
  /** count → sum-of-counts. */
  def countAll: TwoPhase = TwoPhase(count(lit(1)), n => sum(col(n)))
  /** max → max-of-maxes. */
  def maxOf(c: Column): TwoPhase = TwoPhase(max(c), n => max(col(n)))
  /** min → min-of-mins. */
  def minOf(c: Column): TwoPhase = TwoPhase(min(c), n => min(col(n)))

  /**
   * Two-phase skew-proof aggregation: `aggs` maps output column name →
   * TwoPhase spec. The salt assignment is arbitrary row→bucket (algebraic
   * merges make the result independent of WHICH bucket a row lands in),
   * but it must be DETERMINISTIC per row ([[contentSalt]]) so partial
   * recomputation reproduces the exact same partials — see the salt's
   * doc. The group key keeps the caller's column name
   * (or the `keyName` alias for expression keys), so the salted plan is a
   * drop-in schema-identical replacement for `df.groupBy(key).agg(...)`.
   */
  def saltedAggregate(df: DataFrame, key: Column, buckets: Int,
                      aggs: Map[String, TwoPhase],
                      keyName: String = ""): DataFrame = {
    // resolve the output key name: explicit > the key expression's own name
    val outKey =
      if (keyName.nonEmpty) keyName
      else df.select(key).schema.head.name
    val salted = df.withColumn("__salt", contentSalt(df, lit(buckets)))
    val stage1 = salted.groupBy(key.as(outKey), col("__salt"))
      .agg(aggs.head._2.partial.as(aggs.head._1),
        aggs.tail.map { case (n, a) => a.partial.as(n) }.toSeq: _*)
    stage1.groupBy(col(outKey))
      .agg(aggs.head._2.merge(aggs.head._1).as(aggs.head._1),
        aggs.tail.map { case (n, a) => a.merge(n).as(n) }.toSeq: _*)
  }

  /**
   * Salted equi-join for a skewed left side: right side replicated with all
   * `buckets` salt values (keep it small — replication multiplies it), left
   * side salted deterministically by row content; inner/left semantics
   * preserved, replay-safe ([[contentSalt]]).
   */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt_l",
      contentSalt(left, lit(buckets)))
    val replicatedRight = right.withColumn("__salt_r",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight,
        leftKey === rightKey && col("__salt_l") === col("__salt_r"),
        joinType)
      .drop("__salt_l", "__salt_r")
  }

  /**
   * Skew ADVISOR — which keys need the treatments above, decided in exact
   * integer arithmetic: a key is hot when its frequency exceeds
   * `hotFactor ×` the mean key frequency n/ndv, i.e. `freq · ndv >
   * hotFactor · n` (cross-multiplied — no division anywhere), and its
   * recommended salt-bucket count is ⌈freq·ndv / (hotFactor·n)⌉ — the
   * factor by which it outweighs a tolerable key. One table-sized hash
   * aggregate; the verdict math runs on the NDV-sized key-count table.
   * Products ride DECIMAL(38,0) (freq·ndv overflows a long at warehouse
   * cardinalities).
   */

  /**
   * CHEAP sketch PRE-VERDICT (round 13): can this key distribution
   * possibly contain a key past `hotFactor ×` the mean frequency?
   * `false` is a CERTIFICATE of absence — the advised transforms then
   * skip both the exact advisor pass and the salted plan entirely and
   * run the plain join/aggregate, which round 12 measured 1.6–3.0×
   * faster on flat blocking keys (the advisor's exact
   * `groupBy(key).count()` verdict re-computed the exploded key frame
   * purely as overhead). `true` only means "cannot rule it out at
   * sketch precision" — the exact advisor still owns the verdict.
   *
   * ONE aggregation job over the key column (a single-row Count-Min
   * row of `width` counters, each bucket also carrying an HLL key
   * count — map-side combined, `width` output rows, driver math on the
   * collected cells):
   *  - `maxFreqUb = max_b (cnt_b − (kd_b/1.1 − 1))`: a bucket's count
   *    minus its OTHER keys' minimum mass bounds its hottest key's
   *    frequency from above (collision mass only inflates it; the
   *    HLL per-bucket key count is deflated 1.1× so a ±5%-rsd
   *    overestimate cannot turn the bound unsound);
   *  - `ndvUb = 1.1 × Σ_b kd_b` (buckets partition the key domain, so
   *    per-bucket HLLs sum; inflated 1.1× against HLL underestimates).
   * Skip iff `maxFreqUb · ndvUb ≤ hotFactor · n` — every safety factor
   * errs toward `true` (run the exact advisor unnecessarily), never
   * toward silently skipping a genuinely hot key. A >2σ HLL outlier
   * can misjudge a key WITHIN ~10% of the threshold — a
   * performance-only risk: the advised transforms are
   * semantics-preserving with or without salting.
   *
   * 100 TB shape: the sketch pass scans the key column once and
   * shuffles `width` rows regardless of input size (Count-Min's monoid
   * merge IS Spark's partial aggregation); the decision math is
   * driver-side on `width` cells. What it saves at scale is the exact
   * advisor's NDV-sized verdict shuffle AND the doubled left/right
   * scans of the salted join plan on distributions that never needed
   * them.
   */
  def maybeHot(df: DataFrame, keyCol: String, hotFactor: Long,
               width: Int = 4096): Boolean =
    maybeHotKeys(df, Seq(keyCol), hotFactor, width).head

  /**
   * Multi-key [[maybeHot]] in ONE job: an operator running several
   * blocking passes over the same frame ([[graft.ops.RecordLinkage
   * .linkPassesAdvised]]) sketches every pass's key distribution in a
   * single scan — the per-call fixed cost (scan + aggregate stage) is
   * paid once, not once per pass. Per-bucket distinct counts run over
   * the keys' xxhash64 values (HLL of an injective-modulo-collisions
   * hash ≈ HLL of the key, and a long hashes cheaper than a struct).
   * Returns one verdict per key column, aligned with `keyCols`.
   */
  /** Session-lifetime SKETCH-VERDICT MEMO, keyed by the canonicalized
    * analyzed plan of the projected key frame (plus factor/width): the
    * pre-verdict is a STATISTIC of a derived key distribution, and like
    * any optimizer statistic (ANALYZE output, AQE's runtime stats) it
    * is computed once and reused — a pipeline that plans the same
    * blocking join repeatedly (bench passes, retries, incremental runs
    * over an unchanged bootstrap) pays the sketch job once, after which
    * the advised transforms are plan-identical to plain at ZERO extra
    * jobs. Bounded LRU (256 entries of a few booleans — bytes, not
    * frames). Staleness contract: a plan re-reading a path whose FILES
    * changed reuses the old verdict — a performance-only risk (the
    * advised transforms are semantics-preserving with or without
    * salting), same exposure as any cached table statistic. */
  private val verdictMemo =
    new java.util.LinkedHashMap[(Int, String), Seq[Boolean]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String), Seq[Boolean]]): Boolean =
        size() > 256
    }

  /** Drop every memoized sketch verdict (spec isolation / operator
    * hygiene after a known data rewrite). */
  def clearVerdictMemo(): Unit = verdictMemo.synchronized {
    verdictMemo.clear()
  }

  private[graft] def verdictMemoSize: Int =
    verdictMemo.synchronized(verdictMemo.size)

  def maybeHotKeys(df: DataFrame, keyCols: Seq[String], hotFactor: Long,
                   width: Int = 4096): Seq[Boolean] = {
    require(hotFactor >= 1, s"hotFactor must be >= 1: $hotFactor")
    require(keyCols.nonEmpty, "need at least one key column")
    val memoKey = (
      df.select(keyCols.map(col): _*).queryExecution.analyzed
        .canonicalized.hashCode(),
      s"$hotFactor/$width/${keyCols.mkString(",")}")
    verdictMemo.synchronized(Option(verdictMemo.get(memoKey))) match {
      case Some(v) => v
      case None =>
        val verdicts = sketchVerdicts(df, keyCols, hotFactor, width)
        verdictMemo.synchronized(verdictMemo.put(memoKey, verdicts))
        verdicts
    }
  }

  /** The uncached sketch pass of [[maybeHotKeys]]. */
  private def sketchVerdicts(df: DataFrame, keyCols: Seq[String],
                             hotFactor: Long, width: Int): Seq[Boolean] = {
    val cells = df.select(explode(array(keyCols.zipWithIndex.map {
        case (k, i) => struct(lit(i).as("i"),
          when(col(k).isNotNull, xxhash64(col(k))).as("h"))
      }: _*)).as("c"))
      .filter(col("c.h").isNotNull)
      .groupBy(col("c.i").as("i"),
        pmod(col("c.h"), lit(width.toLong)).as("__b"))
      .agg(count(lit(1)).as("cnt"),
        approx_count_distinct(col("c.h")).as("kd"))
      .select(col("i"), col("cnt"), col("kd"))
      .collect()
    val byKey = cells.groupBy(_.getInt(0))
    keyCols.indices.map { i =>
      byKey.get(i) match {
        case None => false // no non-null keys — nothing to salt
        case Some(rows) =>
          val n = rows.map(_.getLong(1)).sum
          val ndvUb = math.max(1L,
            (rows.map(_.getLong(2)).sum * 1.1).toLong + 1)
          val maxFreqUb = rows.map { r =>
            val cnt = r.getLong(1)
            val kdLb = (r.getLong(2) / 1.1).toLong
            cnt - math.max(0L, kdLb - 1L)
          }.max
          BigInt(maxFreqUb) * BigInt(ndvUb) > BigInt(hotFactor) * BigInt(n)
      }
    }
  }
  /**
   * ADVISOR-DRIVEN salted aggregation — [[skewAdvisor]]'s verdicts
   * applied end to end: every key the advisor flags hot aggregates over
   * its OWN recommended bucket count; tolerable keys (and the null
   * group, which the advisor never flags) take the plain single-group
   * path (salt 0). The advice table is hot-keys-only — at most
   * ndv/hotFactor rows by the verdict inequality (each hot key exceeds
   * hotFactor× the mean frequency, and frequencies sum to n) — so it
   * BROADCASTS; the result is provably the plain GROUP BY (algebraic
   * merges, salt-assignment-independent), which is the oracle.
   *
   * Honest scale note: for algebraic aggregates Spark's own map-side
   * partial aggregation already defuses most GROUP-BY skew (reducers
   * merge per-map-task partials, not raw rows) — the advised salt's win
   * is bounded there. Where the advisor's verdicts genuinely change
   * wall time is the JOIN topology ([[advisedJoin]]): a hot join key's
   * probe × fan-out work serializes onto one reducer unsalted, and no
   * partial aggregation exists to save it.
   */
  def advisedAggregate(df: DataFrame, keyCol: String, hotFactor: Long,
                       aggs: Map[String, TwoPhase],
                       preVerdict: Boolean = true): DataFrame = {
    def saltedPlan(): DataFrame = {
      val advice = advisorPlan(df, keyCol, hotFactor)
        .select(col(keyCol).as("__adv_k"), col("salt_buckets"))
      val salted = df
        .join(broadcast(advice), df(keyCol) === col("__adv_k"), "left_outer")
        .withColumn("__salt",
          when(col("salt_buckets").isNotNull,
            contentSalt(df, col("salt_buckets")))
            .otherwise(lit(0)))
      val stage1 = salted.groupBy(col(keyCol), col("__salt"))
        .agg(aggs.head._2.partial.as(aggs.head._1),
          aggs.tail.map { case (n, a) => a.partial.as(n) }.toSeq: _*)
      stage1.groupBy(col(keyCol))
        .agg(aggs.head._2.merge(aggs.head._1).as(aggs.head._1),
          aggs.tail.map { case (n, a) => a.merge(n).as(n) }.toSeq: _*)
    }
    // PRE-VERDICT (round 13): a certified-flat distribution takes the
    // SINGLE-phase plain GROUP BY (map-side partials already defuse
    // what little spread the keys have), cast column-wise to the
    // two-phase plan's dtypes (sum widens decimals per phase) so the
    // two paths stay schema-identical drop-ins.
    if (preVerdict && !maybeHot(df, keyCol, hotFactor)) {
      val aligned = saltedPlan().schema
      df.groupBy(col(keyCol))
        .agg(aggs.head._2.partial.as(aggs.head._1),
          aggs.tail.map { case (n, a) => a.partial.as(n) }.toSeq: _*)
        .select(aligned.map(f =>
          col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    } else saltedPlan()
  }

  /**
   * ADVISOR-DRIVEN salted equi-join: only the keys [[skewAdvisor]]
   * flags hot are salted (left side) and replicated (right side, by
   * that key's own bucket count); tolerable keys join 1:1 on salt 0 —
   * so the replication cost is per-hot-key, not buckets× the whole
   * right side like the uniform [[saltedJoin]]. Inner/left semantics
   * preserved; the advisor runs on the LEFT side's key distribution
   * (the probe side whose skew serializes the join).
   *
   * When to reach for this vs AQE (measured, round 11 at 10× events):
   * AQE's skew-join already splits a hot key whose PROBE-SIDE shuffle
   * partition is oversized — for that input-skew shape the unsalted
   * plan wins (the advisor pass + wider exchange are pure overhead).
   * AQE is blind to OUTPUT-amplification skew: when both sides'
   * partitions look small but one key's left×right product explodes
   * post-shuffle (fan-out joins, per-key pair generation), the shuffle
   * block sizes AQE inspects are unremarkable and the product lands on
   * ONE reducer — that is this transform's regime (SkewSpec measures
   * the win on exactly that shape, AQE on).
   */
  def advisedJoin(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String, hotFactor: Long,
                  joinType: String = "inner",
                  preVerdict: Boolean = true): DataFrame = {
    // PRE-VERDICT (round 13): one cheap sketch pass certifies a flat
    // distribution, in which case the plain join IS the advised plan —
    // no verdict aggregate, no advice broadcast, no salt columns. The
    // round-12 measurement that parked the advisor (exact verdict pass
    // costing 1.6–3.0× the whole plain join on fine blocking keys) is
    // exactly the cost this skips; the hot path below is unchanged.
    if (preVerdict && !maybeHot(left, leftKey, hotFactor))
      return left.join(right, left(leftKey) === right(rightKey), joinType)
    val advice = advisorPlan(left, leftKey, hotFactor)
      .select(col(leftKey).as("__adv_k"), col("salt_buckets"))
    val saltedLeft = left
      .join(broadcast(advice), left(leftKey) === col("__adv_k"),
        "left_outer")
      .withColumn("__salt_l",
        when(col("salt_buckets").isNotNull,
          contentSalt(left, col("salt_buckets")))
          .otherwise(lit(0)))
      .drop("__adv_k", "salt_buckets")
    val replicatedRight = right
      .join(broadcast(advice), right(rightKey) === col("__adv_k"),
        "left_outer")
      .withColumn("__salt_r", explode(sequence(lit(0),
        coalesce(col("salt_buckets"), lit(1L)).cast("int") - 1)))
      .drop("__adv_k", "salt_buckets")
    saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          col("__salt_l") === col("__salt_r"),
        joinType)
      .drop("__salt_l", "__salt_r")
  }

  /** The PINNED advisor surface for direct consumers (q186's gate,
    * operator authors inspecting verdicts): materialized once, caller
    * owns the `unpersist()`. The advised transforms above use the lazy
    * [[advisorPlan]] instead — their verdicts fold into a broadcast at
    * execution, so pinning here would leak one cached frame per
    * advised query into the block manager (the round-11 q220 leak). */
  def skewAdvisor(df: DataFrame, keyCol: String,
                  hotFactor: Long): DataFrame =
    CacheScope.pin(advisorPlan(df, keyCol, hotFactor))

  /** Lazy verdict plan. `freq` appears twice in it (totals + verdict);
    * at execution the two references share one shuffle via exchange
    * reuse, so the table-sized aggregation still runs once. */
  private def advisorPlan(df: DataFrame, keyCol: String,
                          hotFactor: Long): DataFrame = {
    require(hotFactor >= 1, s"hotFactor must be >= 1: $hotFactor")
    // Bucket recommendations are CAPPED at the session's shuffle
    // parallelism: a hot key spread over more buckets than there are
    // reducers buys no additional parallelism and keeps multiplying the
    // right-side replication in advisedJoin (measured round 11: an
    // uncapped verdict of 1876 buckets for a 50%-hot key at 10x events
    // made the advised join 1.4x SLOWER than unsalted). ceil(excess
    // factor) remains the recommendation below the cap. A non-numeric
    // setting (e.g. "auto" on AQE-coalescing runtimes) degrades to the
    // cluster's default parallelism instead of failing plan-build.
    val maxBuckets = scala.util.Try(df.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "200").toLong)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism.toLong)
    val d = "decimal(38,0)"
    val freq = df.select(col(keyCol)).filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("freq"))
    val totals = freq.agg(sum(col("freq")).cast("long").as("n"),
      count(lit(1)).as("ndv"))
    freq.crossJoin(broadcast(totals)) // 1-row totals
      .withColumn("lhs", col("freq").cast(d) * col("ndv"))
      .withColumn("rhs", col("n").cast(d) * hotFactor)
      .filter(col("lhs") > col("rhs"))
      .select(col(keyCol), col("freq"),
        // ceil division of exact decimals: (lhs + rhs - 1) div rhs
        least(expr("CAST((lhs + rhs - 1) div rhs AS BIGINT)"),
          lit(maxBuckets)).as("salt_buckets"))
  }
}
