package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / data-mixing operators: constructing a training
 * mixture means taking a REPRODUCIBLE quota per source (stratum) — "20 k
 * docs of code, 5 k of forums" — not a Bernoulli coin flip that changes
 * between runs and engines.
 *
 * The pseudo-random order is a Knuth multiplicative scramble of the id —
 * plain integer arithmetic, so any engine (and the DuckDB oracle)
 * reproduces the exact same sample; no RNG state, no engine-specific hash.
 *
 * Scale shape: one shuffle on the stratum key + a per-stratum window sort.
 * With caps ≪ stratum sizes, pre-prune first: keep rows with
 * scramble < (cap/n)·S·margin (one cheap aggregate for n per stratum),
 * then run the exact window on the survivors — the sort input shrinks from
 * the corpus to ~margin·cap rows per stratum. [[quotaSamplePruned]]
 * implements that and falls back to the exact path for any stratum the
 * margin starved (checked with one count — correctness never depends on
 * the margin).
 */
object Sampling {

  private val Scale = 1L << 32

  /** Knuth multiplicative scramble onto [0, 2^32) — the shared
    * pseudo-random order. */
  def scramble(id: Column): Column = pmod(id * lit(2654435761L), lit(Scale))

  /**
   * Proportional budget APPORTIONMENT by largest remainder (the Hare-
   * quota / Hamilton method): split an integer sample budget `B` across
   * strata proportionally to their row counts, in EXACT integer
   * arithmetic — floor seats = (B·nᵢ) div N, the `B − Σ floor` leftover
   * seats go to the largest remainders (B·nᵢ) mod N, ties to the first
   * stratum by name. The allocation step upstream of [[quotaSample]]'s
   * fixed per-stratum quotas; also the shard-budget split shape.
   *
   * One table-sized hash aggregate (map-side combined); everything after
   * runs on the strata table (≤ NDV(stratum) rows — the windows are
   * candidate-set-sized by construction, the q176 discipline).
   */
  def largestRemainderAllocation(df: DataFrame, stratumCol: String,
                                 budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val all = Window.partitionBy().orderBy(col(stratumCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // NULL strata excluded (engines disagree on NULL ordering in the
    // remainder tiebreak); budget·n_rows rides DECIMAL(38,0) — it
    // overflows a long at warehouse row counts (the CardEst convention)
    val strata = df.select(col(stratumCol))
      .filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("n_total", sum(col("n_rows")).over(all))
      .withColumn("floor_seats",
        expr(s"CAST((CAST(${budget}L AS DECIMAL(38,0)) * n_rows)" +
          " div n_total AS BIGINT)"))
      .withColumn("remainder_num",
        expr(s"CAST((CAST(${budget}L AS DECIMAL(38,0)) * n_rows)" +
          " % n_total AS BIGINT)"))
    strata
      .withColumn("leftover", lit(budget) - sum(col("floor_seats")).over(all))
      .withColumn("rem_rank", row_number().over(
        Window.orderBy(col("remainder_num").desc, col(stratumCol))))
      .select(col(stratumCol), col("n_rows"), col("floor_seats"),
        col("remainder_num"),
        (col("floor_seats") +
          when(col("rem_rank") <= col("leftover"), 1L).otherwise(0L))
          .as("seats"))
  }

  /** At most `cap` rows per stratum, chosen by ascending scramble(id)
    * (id tiebreak): the exact, engine-reproducible mixture. */
  def quotaSample(df: DataFrame, stratumCol: String, idCol: String,
                  cap: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(scramble(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Per-stratum quotas (absent stratum → dropped): the weighted-mixture
    * form; quotas ride a broadcast join, selection rule identical to
    * [[quotaSample]]. */
  def mixture(df: DataFrame, stratumCol: String, idCol: String,
              quotas: Map[String, Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = quotas.toSeq.toDF(stratumCol, "__cap")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(scramble(col(idCol)), col(idCol))
    df.join(broadcast(q), Seq(stratumCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__cap"))
      .drop("__rn", "__cap")
  }

  /**
   * Rate-based deterministic sample: keep rows with scramble(id) < rate·2³².
   * Unlike the cap-based quota this is a PURE PER-ROW PREDICATE — no
   * window, no shuffle, embarrassingly parallel — and a row's fate is
   * stable under corpus growth (new rows can't evict old members, the way
   * a rank-based cap can). The rate is exact in distribution over the
   * scramble's uniform spread of ids, not a Bernoulli coin flip: the same
   * engine-reproducible arithmetic as [[quotaSample]].
   */
  def rateSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    df.filter(scramble(col(idCol)) < lit(math.round(rate * Scale)))
  }

  /**
   * Fractional/epoch WEIGHTED mixture — the "10 % of web, 3 epochs of
   * code" training-mix form: each stratum's rate r expands to
   * floor(r) full copies (epochs 1..floor(r)) plus a rate-(r−floor(r))
   * deterministic sample as the final partial epoch. Output adds
   * `epochCol`; strata absent from `rates` are dropped.
   *
   * Scale shape: one broadcast join of the rate table + a per-row
   * sequence-explode — no shuffle, no window; the expansion factor is
   * exactly the stratum's rate.
   */
  def rateMixture(df: DataFrame, stratumCol: String, idCol: String,
                  rates: Map[String, Double],
                  epochCol: String = "epoch"): DataFrame = {
    require(rates.values.forall(_ >= 0.0), "negative rate")
    val spark = df.sparkSession
    import spark.implicits._
    val rt = rates.toSeq.map { case (s, r) =>
      (s, r.toLong, math.round((r - r.toLong) * Scale))
    }.toDF(stratumCol, "__full", "__thr")
    val nEpochs = (col("__full") +
      when(scramble(col(idCol)) < col("__thr"), lit(1L)).otherwise(lit(0L)))
      .cast("int")
    df.join(broadcast(rt), Seq(stratumCol))
      .withColumn(epochCol, explode(
        when(nEpochs >= 1, sequence(lit(1), nEpochs))
          .otherwise(array().cast("array<int>"))))
      .drop("__full", "__thr")
  }

  /**
   * The 100 TB path: pre-prune by a scramble threshold before the window,
   * so the per-stratum sort sees ~margin·cap rows instead of the stratum.
   * A post-check counts each stratum's pruned sample; any stratum the
   * margin starved (fewer than min(cap, n) survivors) is re-sampled
   * exactly — the result EQUALS [[quotaSample]] always, the margin only
   * decides how much work the fast path saves.
   */
  def quotaSamplePruned(df: DataFrame, stratumCol: String, idCol: String,
                        cap: Int, margin: Double = 4.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sizes = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
    val pruned = df.join(broadcast(sizes), Seq(stratumCol))
      .filter(scramble(col(idCol)) <
        least(lit(Scale.toDouble),
          lit(margin * cap * Scale) / col("__n")).cast("long"))
      .drop("__n")
    val sampled = quotaSample(pruned, stratumCol, idCol, cap)
    // starvation check: strata where the prune kept fewer than the quota
    // (or the whole stratum, if smaller) need the exact path
    val got = sampled.groupBy(col(stratumCol)).agg(count(lit(1)).as("__got"))
    val starved = sizes.join(got, Seq(stratumCol), "left")
      .filter(coalesce(col("__got"), lit(0L)) <
        least(col("__n"), lit(cap.toLong)))
      .select(col(stratumCol))
    val starvedKeys = starved.collect().map(_.get(0)).toSeq // #strata-bounded
    if (starvedKeys.isEmpty) sampled
    else {
      val redo = quotaSample(
        df.filter(col(stratumCol).isin(starvedKeys: _*)),
        stratumCol, idCol, cap)
      sampled.filter(!col(stratumCol).isin(starvedKeys: _*))
        .unionByName(redo)
    }
  }
}
