package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.ops.Cep

/**
 * Streaming twin of the CEP funnel matcher ([[graft.ops.Cep]], q165's
 * engine): the SAME transition function ([[Cep.step]]) run as keyed
 * state under flatMapGroupsWithState, so a match can open in one
 * micro-batch and close many batches later with nothing but one
 * fixed-size state record per key in the store — the state scales with
 * DISTINCT KEYS, never with events or match length.
 *
 * Ordering contract: rows are sorted by (t, tie) WITHIN each
 * micro-batch per key; ACROSS batches the per-key arrival order must
 * respect event order — the guarantee a keyed log (e.g. a partitioned
 * commit log consumed per key, or a replayed CDC stream) provides.
 * Under that contract CepStreamSpec proves the streaming output is
 * byte-equal to the batch matcher on the same events for every batch
 * split. (Tolerating cross-batch disorder would mean buffering events
 * in state until the watermark passes — a different cost model; the
 * ordered-log contract is the one production funnel pipelines run on.)
 */
object CepStream {

  final case class CepEvent(k: Long, t: Long, tie: Long, ty: String)
  final case class CepMatch(user_id: Long, start_us: Long, end_us: Long,
                            n_mid: Long)

  def funnelMatches(events: Dataset[CepEvent], startType: String,
                    midType: String, endType: String,
                    maxSpanUs: Long): Dataset[CepMatch] =
    funnelMatches(events, startType, Set(midType), endType, maxSpanUs)

  /** Alternation variant — `startType (m₁|m₂|…)* endType`. */
  def funnelMatches(events: Dataset[CepEvent], startType: String,
                    midTypes: Set[String], endType: String,
                    maxSpanUs: Long): Dataset[CepMatch] =
    streamMatches(events, (st, ty, t) =>
      Cep.step(st, ty, t, startType, midTypes, endType, maxSpanUs))

  /** QUANTIFIED variant — `start (mid){minMid,maxMid} end`, the same
    * [[Cep.stepQuant]] kernel the batch matcher runs (bound and
    * overlap-policy semantics there); state stays the one fixed-size
    * record — the counter is the quantifier. */
  def funnelMatchesQuant(events: Dataset[CepEvent], startType: String,
                         midTypes: Set[String], endType: String,
                         minMid: Long, maxMid: Long, maxSpanUs: Long,
                         greedyOverlap: Boolean = false)
      : Dataset[CepMatch] =
    streamMatches(events, (st, ty, t) =>
      Cep.stepQuant(st, ty, t, startType, midTypes, endType, minMid,
        maxMid, maxSpanUs, greedyOverlap))

  private def streamMatches(events: Dataset[CepEvent],
                            transition: (Cep.MatchState, String, Long) =>
                              (Cep.MatchState, Option[(Long, Long, Long)]))
      : Dataset[CepMatch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[CepEvent],
         state: GroupState[Cep.MatchState]) =>
          var st = state.getOption.getOrElse(Cep.EmptyState)
          val out = Seq.newBuilder[CepMatch]
          rows.toArray.sortBy(e => (e.t, e.tie)).foreach { e =>
            val (nst, emit) = transition(st, e.ty, e.t)
            st = nst
            emit.foreach { case (s, en, m) =>
              out += CepMatch(key, s, en, m)
            }
          }
          // a key with no open funnel stores NOTHING — otherwise every
          // key ever seen pins a state record forever (unbounded store
          // growth on high-cardinality streams); the store stays
          // proportional to OPEN matches
          if (st == Cep.EmptyState) { if (state.exists) state.remove() }
          else state.update(st)
          out.result().iterator
      }
  }

  /** The same matcher on `transformWithState` (Spark 4's successor
    * state API — RocksDB store, named state slots): one
    * ValueState[[Cep.MatchState]] per key, the identical [[Cep.step]]
    * kernel. CepStreamSpec proves output-equivalence with
    * [[funnelMatches]] batch-for-batch. */
  def funnelMatchesTws(events: Dataset[CepEvent], startType: String,
                       midTypes: Set[String], endType: String,
                       maxSpanUs: Long): Dataset[CepMatch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.k)
      .transformWithState(
        new CepProcessor(startType, midTypes, endType, maxSpanUs),
        TimeMode.None(), OutputMode.Append())
  }

  /** One fixed-size MatchState slot per key (no TTL — an open funnel
    * lives until its stream closes or breaks it). */
  class CepProcessor(startType: String, midTypes: Set[String],
                     endType: String, maxSpanUs: Long)
    extends StatefulProcessor[Long, CepEvent, CepMatch] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[Cep.MatchState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Cep.MatchState]("cep",
        Encoders.product[Cep.MatchState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[CepEvent],
                                 timers: TimerValues): Iterator[CepMatch] = {
      var st = if (state.exists()) state.get() else Cep.EmptyState
      val out = Seq.newBuilder[CepMatch]
      rows.toArray.sortBy(e => (e.t, e.tie)).foreach { e =>
        val (nst, emit) = Cep.step(st, e.ty, e.t, startType, midTypes,
          endType, maxSpanUs)
        st = nst
        emit.foreach { case (s, en, m) => out += CepMatch(key, s, en, m) }
      }
      // same no-open-funnel ⇒ no-record rule as the fMGWS twin
      if (st == Cep.EmptyState) state.clear() else state.update(st)
      out.result().iterator
    }
  }
}
