package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Bloom-filter semi-join reduction: probe-side rows that CANNOT match the
 * build side are dropped at the scan, BEFORE the join's shuffle moves them.
 *
 * The gap this fills: Spark picks broadcast-hash when the build side's
 * ROWS fit in the driver/executors, and otherwise shuffles BOTH sides.
 * In between sits the common warehouse case — a build side too big to
 * broadcast as a hash relation (keys + payload), whose bloom DIGEST
 * (~1.2 bytes/key at 1% fpp: a 10⁸-key dimension is a ~120 MB bitset) is
 * still perfectly broadcastable. Filtering the 100 TB fact side to the
 * ~join-selectivity fraction before the exchange is the difference between
 * shuffling everything and shuffling only plausible matches — the manual,
 * composable form of Spark's own runtime-filter rewrite (which only fires
 * inside narrow DPP/AQE patterns).
 *
 * Mechanics: the digest is built DISTRIBUTED (`DataFrame.stat.bloomFilter`
 * runs a treeAggregate — executors fold partitions into partial bitsets,
 * merged pairwise; only the final sketch lands on the driver), then probed
 * by the native codegen'd [[graft.functions.BloomMightContain]] expression.
 * False positives (rate `fpp`) survive the filter and are eliminated by
 * the join itself, so the composition is EXACT — the q81 gate hash-checks
 * it against the undecorated join.
 */
object BloomJoin {

  /** Build the key digest (distributed treeAggregate; see object doc).
    * `expectedItems` sizes the bitset — overshoot costs bits, undershoot
    * costs fpp; pass the dimension's row estimate (catalog stats in a real
    * deployment). */
  def keyFilter(build: DataFrame, key: String, expectedItems: Long,
                fpp: Double = 0.01): BloomFilter =
    build.stat.bloomFilter(key, expectedItems, fpp)

  /** Membership probe Column over a built digest (native expression;
    * serialized once here, deserialized once per executor codegen class). */
  def mightContain(filter: BloomFilter, key: Column): Column = {
    val bos = new ByteArrayOutputStream()
    filter.writeTo(bos)
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("bloom_contains", key, lit(bos.toByteArray))
  }

  /**
   * Inner equi-join with probe-side bloom reduction. `probe` is the big
   * (fact) side, `build` the smaller (dimension) side whose keys seed the
   * digest. Exact: identical result to `probe.join(build, keys)`.
   */
  def prunedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val digest = keyFilter(build, buildKey, expectedItems, fpp)
    probe.filter(mightContain(digest, col(probeKey)))
      .join(build, col(probeKey) === col(buildKey))
  }
}
