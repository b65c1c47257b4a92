package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Order-independent table checksums — the primitive a 100 TB migration /
 * replication / backfill job uses to prove two copies of a table are
 * identical WITHOUT sorting either one: per-row digests are summed, and
 * commutative exact addition makes the result independent of row order,
 * partitioning and shuffle schedule. Comparing two checksums is O(groups),
 * not O(rows log rows).
 *
 * The row digest is the first 48 bits of the row's md5 (a standard
 * algorithm every engine implements identically), summed as DECIMAL(38,0)
 * so the total is exact at any row count (2^48-max addends need ~10^24
 * rows to overflow 38 digits). Sums are algebraic, so Spark computes
 * map-side partials and the op is one hash aggregate — no sort, no window.
 *
 * A mismatched group pinpoints WHERE two copies diverge; pairing the sum
 * with the row count distinguishes drops from corruptions (same n + bad
 * sum = corrupted rows, short n = lost rows).
 */
object Checksum {

  /** Injective per-column canonicalization: NULL → the sentinel `N`
    * (which no length-prefixed value can produce), anything else →
    * `<charLength>:<value>`. The length prefix makes the joined row
    * string prefix-free-decodable, so values containing the join
    * delimiter — or NULL/empty asymmetries like ('a', NULL) vs
    * (NULL, 'a') — can never collide. Twin of the CASE/`||` form the
    * q98 oracle states in DuckDB SQL. */
  private def canon(c: Column): Column = {
    val s = c.cast("string")
    coalesce(concat(length(s).cast("string"), lit(":"), s), lit("N"))
  }

  /** 48-bit md5-prefix digest of the row canonicalized as a '|'-joined
    * string of length-prefixed, NULL-sentineled `cols` (cast to string;
    * engine-portable for string and integer columns — float/timestamp
    * columns should be canonicalized by the caller, string formatting
    * differs across engines). NULLs digest as a distinct sentinel, so
    * NULL-vs-empty and column-transposition corruptions are visible. */
  def rowDigest(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", cols.map(canon): _*)), 1, 12), 16, 10)
      .cast(DecimalType(38, 0))

  /** Per-group (count, checksum) over the canonicalized `rowCols`. */
  def tableChecksum(df: DataFrame, groupCols: Seq[String],
                    rowCols: Seq[Column]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(rowDigest(rowCols)).cast(DecimalType(38, 0)).as("checksum"))
}
