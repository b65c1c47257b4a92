package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Complex-event-processing primitive: contiguous sequential pattern
 * matching over per-key ordered event streams — the MATCH_RECOGNIZE /
 * Flink-CEP capability Spark's declarative surface lacks (a fixed-length
 * pattern is LEAD/LAG; a Kleene `mid*` pattern is not, because the match
 * length is data-dependent).
 *
 * Shape for 100 TB: ONE hash repartition on the key plus an in-partition
 * external sort (`sortWithinPartitions` spills; nothing ever materializes
 * a whole group in memory), then a single forward pass with O(1) matcher
 * state per stream — the same execution shape as a streaming CEP engine's
 * keyed state, so the operator scales with executors and is insensitive
 * to per-key event counts (no `collect_list` of a user's history
 * anywhere).
 *
 * Match semantics (the standard AFTER MATCH SKIP PAST LAST ROW greedy
 * run): a match is `startType (midType)* endType` CONTIGUOUS in the
 * key's full stream ordered by (ts, tie) — any other event type breaks
 * the run; a second `startType` restarts it (the innermost start wins);
 * matches never overlap because the state resets on emission.
 */
object Cep {

  /** Matcher state: the open partial match, if any. `pending < 0` means
    * no run is open. One fixed-size record — this is also the per-key
    * streaming state ([[graft.streaming.CepStream]] carries it across
    * micro-batches), so batch and streaming share the ONE transition
    * function below. */
  final case class MatchState(pending: Long, mids: Long)
  val EmptyState: MatchState = MatchState(-1L, 0L)

  /** The single state transition both execution modes run: feed one
    * event, get the next state and (possibly) an emitted match
    * (start_us, end_us, n_mid). The Kleene segment accepts a SET of
    * types (alternation — `start (a|b)* end`); precedence when a type
    * plays several roles is start, then end, then mid. The unbounded
    * `mid*` is [[stepQuant]]'s {0,∞} special case — one kernel. */
  def step(st: MatchState, ty: String, t: Long, startType: String,
           midTypes: Set[String], endType: String,
           maxSpanUs: Long): (MatchState, Option[(Long, Long, Long)]) =
    stepQuant(st, ty, t, startType, midTypes, endType,
      minMid = 0L, maxMid = Long.MaxValue, maxSpanUs,
      greedyOverlap = false)

  /**
   * QUANTIFIED transition — `start (mid){minMid,maxMid} end`, still one
   * fixed-size state record (the counter the state already carries IS
   * the quantifier machinery):
   *
   *  - an `end` with the counter in [minMid, maxMid] (and span in
   *    bound) emits; out of bounds, the run is consumed with no match
   *    (AFTER MATCH SKIP PAST LAST ROW — the next match needs a fresh
   *    start either way);
   *  - a `mid` that would push the counter past maxMid kills the run
   *    right there (contiguity means no suffix can rescue it: a new
   *    match needs a start event);
   *  - `greedyOverlap` decides the one genuinely ambiguous case, a type
   *    that is BOTH mid and end while a run is open: reluctant (false,
   *    the default and the `mid*` precedence above) closes as soon as
   *    closing is legal and extends otherwise; greedy (true) extends
   *    while the counter can still grow and closes only at the cap.
   *    Both are deterministic single-pass policies with O(1) state —
   *    full nondeterministic greedy semantics (emit the LONGEST
   *    eventually-closable run) needs lookahead buffering, a different
   *    cost model, and is out of contract (stated, not hidden).
   */
  def stepQuant(st: MatchState, ty: String, t: Long, startType: String,
                midTypes: Set[String], endType: String, minMid: Long,
                maxMid: Long, maxSpanUs: Long, greedyOverlap: Boolean)
      : (MatchState, Option[(Long, Long, Long)]) = {
    def close(): (MatchState, Option[(Long, Long, Long)]) = {
      val emit = if (st.mids >= minMid && st.mids <= maxMid &&
          t - st.pending <= maxSpanUs)
        Some((st.pending, t, st.mids)) else None
      (EmptyState, emit)
    }
    def extend(): (MatchState, Option[(Long, Long, Long)]) =
      if (st.mids + 1L > maxMid) (EmptyState, None)
      else (MatchState(st.pending, st.mids + 1L), None)
    val isMid = midTypes.contains(ty)
    ty match {
      case `startType` => (MatchState(t, 0L), None)
      case `endType` if st.pending >= 0L =>
        if (isMid && greedyOverlap && st.mids + 1L <= maxMid) extend()
        else if (isMid && !greedyOverlap && st.mids < minMid) extend()
        else close()
      case _ if isMid && st.pending >= 0L => extend()
      case _ => (EmptyState, None)
    }
  }

  /** Matches of `startType (midType)* endType` per key, bounded by
    * `maxSpanUs` end-to-end. Output: (key, start_us, end_us, n_mid),
    * one row per match.
    *
    * @param tsUs  event-time column in epoch microseconds (LongType)
    * @param tie   total-order tiebreak within equal timestamps (LongType,
    *              e.g. an event id — makes the scan order deterministic)
    */
  def funnelMatches(events: DataFrame, keyCol: String, tsUs: Column,
                    tie: Column, eventType: Column, startType: String,
                    midType: String, endType: String,
                    maxSpanUs: Long): DataFrame =
    funnelMatches(events, keyCol, tsUs, tie, eventType, startType,
      Set(midType), endType, maxSpanUs)

  /** Alternation variant: the Kleene segment accepts any of
    * `midTypes` — `startType (m₁|m₂|…)* endType`. */
  def funnelMatches(events: DataFrame, keyCol: String, tsUs: Column,
                    tie: Column, eventType: Column, startType: String,
                    midTypes: Set[String], endType: String,
                    maxSpanUs: Long): DataFrame =
    scanMatches(events, keyCol, tsUs, tie, eventType,
      (st, ty, t) => step(st, ty, t, startType, midTypes, endType,
        maxSpanUs))

  /** QUANTIFIED variant — `startType (mid){minMid,maxMid} endType`
    * (see [[stepQuant]] for the bound and overlap-policy semantics):
    * the MATCH_RECOGNIZE `{n,m}` quantifier on the same one-shuffle,
    * O(1)-state scan. */
  def funnelMatchesQuant(events: DataFrame, keyCol: String, tsUs: Column,
                         tie: Column, eventType: Column,
                         startType: String, midTypes: Set[String],
                         endType: String, minMid: Long, maxMid: Long,
                         maxSpanUs: Long,
                         greedyOverlap: Boolean = false): DataFrame = {
    require(0L <= minMid && minMid <= maxMid,
      s"quantifier bounds out of order: {$minMid,$maxMid}")
    scanMatches(events, keyCol, tsUs, tie, eventType,
      (st, ty, t) => stepQuant(st, ty, t, startType, midTypes, endType,
        minMid, maxMid, maxSpanUs, greedyOverlap))
  }

  /** The shared execution scaffold: one hash repartition on the key, an
    * in-partition external sort, one forward pass of `transition` with
    * O(1) matcher state per stream. */
  private def scanMatches(events: DataFrame, keyCol: String, tsUs: Column,
                          tie: Column, eventType: Column,
                          transition: (MatchState, String, Long) =>
                            (MatchState, Option[(Long, Long, Long)]))
      : DataFrame = {
    val prepared = events
      .select(col(keyCol).as("k"), tsUs.as("t"), tie.as("tie"),
        eventType.as("ty"))
      // a null timestamp or tiebreak carries no ordering information —
      // such an event cannot take a defined place in the per-key stream,
      // so it is excluded up front (same non-null order-column contract
      // PrefixScan asserts) instead of NPE-ing the partition scan below
      .filter(col("t").isNotNull && col("tie").isNotNull)
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("tie"))
    val keyField = prepared.schema("k")
    val outSchema = StructType(Seq(
      StructField(keyCol, keyField.dataType, keyField.nullable),
      StructField("start_us", LongType, nullable = false),
      StructField("end_us", LongType, nullable = false),
      StructField("n_mid", LongType, nullable = false)))
    prepared.mapPartitions { rows =>
      new Iterator[Row] {
        private var curKey: Any = null
        private var haveKey = false
        private var st = EmptyState
        private var nextMatch: Row = null

        private def advance(): Unit = {
          while (nextMatch == null && rows.hasNext) {
            val r = rows.next()
            val k = r.get(0)
            if (!haveKey || k != curKey) { // new stream: reset state
              curKey = k; haveKey = true; st = EmptyState
            }
            val (nst, emit) = transition(st, r.getString(3), r.getLong(1))
            st = nst
            emit.foreach { case (s, e, m) => nextMatch = Row(k, s, e, m) }
          }
        }

        override def hasNext: Boolean = { advance(); nextMatch != null }
        override def next(): Row = {
          advance()
          val m = nextMatch; nextMatch = null; m
        }
      }
    }(Encoders.row(outSchema))
  }
}
