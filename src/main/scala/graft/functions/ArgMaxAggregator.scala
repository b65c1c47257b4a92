package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed argmax as an `Aggregator` — the optional UDAF-surface demonstration
 * from SURVEY §7.3: for rows (k, payload), return the payload of the max k,
 * ties broken by the larger payload (mirroring the struct-max ordering used
 * by HighlightQueries.distinctSourcesHighlights, so the two formulations are
 * provably equivalent — see ArgMaxSpec).
 *
 * Merge is associative/commutative, so Spark runs it as a partial (map-side)
 * aggregate + final merge: one (k, payload) pair per partition crosses the
 * shuffle, the same scale shape as built-in max_by.
 */
class ArgMaxLongString extends Aggregator[(Long, String), (Long, String), String] {
  private val minBuf: (Long, String) = (Long.MinValue, null)

  override def zero: (Long, String) = minBuf

  override def reduce(b: (Long, String), a: (Long, String)): (Long, String) =
    better(b, a)

  override def merge(b1: (Long, String), b2: (Long, String)): (Long, String) =
    better(b1, b2)

  private def better(a: (Long, String), b: (Long, String)): (Long, String) =
    if (b._1 > a._1) b
    else if (b._1 < a._1) a
    else if (a._2 == null || (b._2 != null && b._2 > a._2)) b
    else a

  override def finish(r: (Long, String)): String =
    if (r._1 == Long.MinValue) null else r._2

  override def bufferEncoder: Encoder[(Long, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
