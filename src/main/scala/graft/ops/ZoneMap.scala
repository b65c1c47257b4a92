package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Zone maps (min/max data-skipping statistics) as a first-class table —
 * the planning-time half of the layout story [[ZOrder]] starts: cluster
 * the table so each storage unit ("zone" ≙ file / row group / Delta
 * AddFile) spans a tight range in the filter dimensions, keep per-zone
 * min/max, and answer "which zones can this predicate skip?" from
 * METADATA, never touching the data.
 *
 * Spark already prunes parquet row groups with embedded min/max at scan
 * time; what it does NOT give you is the stats table itself — the thing a
 * 100 TB lakehouse queries to (a) audit how selective a layout really is
 * for a workload's predicates before paying for a re-cluster, and (b)
 * drive manifest-level file pruning in a custom source. This op builds
 * it: ONE map-side-combined hash aggregate over the table (min/max/count
 * are algebraic), output rows = zones — metadata-scale, O(files) not
 * O(rows). The skip audit is then a map over that table (microseconds at
 * any corpus size), exactly how Delta/Iceberg evaluate partition/file
 * pruning against collected stats.
 */
object ZoneMap {

  /**
   * Per-zone min/max/count stats: one row per distinct value of `zone`,
   * with `n_rows` plus `min_<name>`/`max_<name>` for every (name, col)
   * in `dims`. The zone expression is typically top bits of a clustering
   * key (z-order macro cell, day bucket, file id).
   */
  def zoneStats(df: DataFrame, zone: Column,
                dims: Seq[(String, Column)]): DataFrame = {
    val aggs = dims.flatMap { case (name, c) =>
      Seq(min(c).as(s"min_$name"), max(c).as(s"max_$name"))
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(zone.as("zone")).agg(aggs.head, aggs.tail: _*)
  }

  /** Mark each zone with whether `mustScan` rules it OUT for a query:
    * `skippable` = the predicate can touch NO row in the zone, proven
    * from the zone's min/max alone. `mustScan` states the CONTRAPOSITIVE
    * (zone may contain a matching row); callers build it from the query
    * predicate with interval logic, e.g. for `x >= a AND y < b`:
    * `max_x >= a AND min_y < b`. */
  def skipAudit(stats: DataFrame, mustScan: Column): DataFrame =
    stats.withColumn("skippable", !mustScan)
}
