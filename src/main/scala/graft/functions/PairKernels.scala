package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bucket-local Hamming pair kernel for SimHash blocking
 * (`graft.ops.Dedup.simhashVerifiedPairs`).
 *
 * Inputs: two arrays of struct<id: bigint, fp: bigint> — the exact-banded
 * docs and the multi-probed docs sharing one (band_idx, band_val) bucket —
 * plus the Hamming bound. Output: array of struct<id_a, id_b> with
 * id_a < id_b and bit_count(fp_a XOR fp_b) ≤ maxDist.
 *
 * Why an expression instead of the equi-join: the blocking join's OUTPUT
 * is the quadratic term (measured 3.7e8 collision rows at 50k docs for
 * 27.5k survivors), and each of those rows used to be materialized as a
 * joined row flowing through codegen operators just to die in the
 * bit_count filter. Grouping each bucket to one row and running the
 * cross-check as a primitive long-loop here evaluates the same XOR/POPCNT
 * per candidate at ~nanosecond cost with ZERO per-candidate row overhead —
 * only survivors (a few per million) allocate anything. The expression is
 * evaluated once per BUCKET (thousands of calls), so interpreted eval via
 * CodegenFallback costs nothing measurable.
 *
 * Scale shape: per-bucket work is |A|·|B| with buckets pre-partitioned by
 * the groupBy shuffle; the hottest measured bucket at 50k docs is ~530×5k
 * ≈ 2.6M probes — microseconds. Past ~10⁷ docs per band-value bucket the
 * arrays themselves grow unwieldy and the calibration story changes (see
 * simhashVerifiedPairs' scaladoc).
 */
case class HammingBucketPairs(left: Expression, right: Expression,
                              maxDist: Int)
    extends BinaryExpression with CodegenFallback {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(StructType(fs), _) =>
      fs.length == 2 && fs.forall(_.dataType == LongType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_bucket_pairs requires two array<struct<bigint,bigint>> args, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true
  override def prettyName: String = "hamming_bucket_pairs"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    // unpack once: ArrayData.getStruct in the inner loop re-wraps per call
    val aId = new Array[Long](na); val aFp = new Array[Long](na)
    var i = 0
    while (i < na) {
      val s = a.getStruct(i, 2); aId(i) = s.getLong(0); aFp(i) = s.getLong(1)
      i += 1
    }
    val bId = new Array[Long](nb); val bFp = new Array[Long](nb)
    var j = 0
    while (j < nb) {
      val s = b.getStruct(j, 2); bId(j) = s.getLong(0); bFp(j) = s.getLong(1)
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    i = 0
    while (i < na) {
      val ia = aId(i); val fa = aFp(i)
      j = 0
      while (j < nb) {
        if (ia < bId(j) &&
            java.lang.Long.bitCount(fa ^ bFp(j)) <= maxDist) {
          out += new GenericInternalRow(Array[Any](ia, bId(j)))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingBucketPairs =
    copy(left = newLeft, right = newRight)
}

/**
 * Fused word-n-gram shingle hashing: `ngram_hashes(words, n)` emits the
 * xxhash64 (seed 42, Spark's builtin seed) of each n-consecutive-word
 * window joined with a single space — bit-identical to the builtin chain
 * `transform(shingles(text, n), s -> xxhash64(s))` (FunctionsSpec proves
 * it), including the short-doc convention: fewer than n words hash as ONE
 * shingle of the whole word list (empty string for zero words).
 *
 * Why: the builtin formulation walks THREE interpreted higher-order
 * functions per window (`transform` → `slice` → `concat_ws`), allocating a
 * sliced array plus a joined string per position per row — measured 22.5 s
 * just to tokenize 50k docs for the q97 set-similarity join, 4× the cost
 * of the join itself. This is one primitive loop per row: each window is
 * one `UTF8String.concatWs` and one XXH64 call. Downstream set ops then
 * run on longs (array_distinct/sort on primitives), never on string
 * arrays.
 */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_hashes"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    def windowHash(start: Int, len: Int): Long = {
      val parts = new Array[UTF8String](len)
      var i = 0
      while (i < len) { parts(i) = arr.getUTF8String(start + i); i += 1 }
      // concatWs skips null elements — same as the SQL concat_ws
      val joined = UTF8String.concatWs(sep, parts: _*)
      XXH64.hashUTF8String(joined, 42L)
    }
    if (m < n) new GenericArrayData(Array(windowHash(0, m)))
    else {
      val out = new Array[Long](m - n + 1)
      var i = 0
      while (i <= m - n) { out(i) = windowHash(i, n); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}
