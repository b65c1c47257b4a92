package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native dot product over two numeric array columns (the ANN hot path —
 * q28/q29/q34/q35 evaluate it 1-3× per corpus row).
 *
 * The builtin formulation `aggregate(zip_with(a, b, (x, y) => x*y), 0d, +)`
 * is codegen'd but materializes the zipped intermediate ARRAY per row and
 * walks it through two higher-order function frames; this expression is one
 * fused primitive loop over the two ArrayData buffers — no allocation, full
 * whole-stage codegen (SURVEY §7.3's preferred extension tier, like
 * RollingHash).
 *
 * Semantics are IDENTICAL to the builtin chain (FunctionsSpec proves it):
 * products accumulated left-to-right in index order (same doubles), NULL if
 * either array is NULL, contains a NULL element, or lengths differ (zip_with
 * pads with NULL → the aggregate sum is NULL).
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<float|double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = xa.numElements()
    if (n != xb.numElements()) return null
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || xb.isNullAt(i)) return null
      val va = if (ta == FloatType) xa.getFloat(i).toDouble else xa.getDouble(i)
      val vb = if (tb == FloatType) xb.getFloat(i).toDouble else xb.getDouble(i)
      acc += va * vb
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, t: DataType, i: String): String =
        if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += ${get(a, elemType(left).get, i)} * ${get(b, elemType(right).get, i)};
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/**
 * Fused 64-bit SimHash over an array of 64-bit feature hashes: per bit,
 * sum +1/−1 across elements, bit set iff the sum is positive.
 *
 * The builtin formulation evaluates 64 SEPARATE `aggregate()` higher-order
 * lambdas per row (one pass over the array per bit); this is one primitive
 * loop accumulating all 64 counters — same result on NULL-FREE arrays
 * (FunctionsSpec proves bit-equality; every engine call site hashes
 * non-null tokens, so its inputs qualify). Deliberate divergence on a NULL
 * element: this expression propagates NULL, where the builtin chain
 * accidentally yields an all-zero fingerprint (each NULL bit-sum fails its
 * `> 0` test) — spec-locked in FunctionsSpec.
 */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val bad = ctx.freshName("bad")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $arr.numElements();
         |int[] $counts = new int[64];
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) { $bad = true; break; }
         |  long $h = $arr.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  long $fp = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($counts[$b] > 0) $fp |= 1L << $b;
         |  }
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * Fused MinHash signature over an array of int feature hashes: k seeded
 * minima in ONE pass over the array (inner loop over seeds), replacing the
 * builtin `transform(sequence(0,k−1), seed → array_min(transform(ih, s →
 * hash(s, seed))))` which materializes k transformed arrays per row.
 *
 * Bit-compatible with the builtin on NON-EMPTY NULL-FREE arrays: Spark's
 * `hash(s, seed)` chains murmur3 as h = hashInt(seed_arg, hashInt(s, 42)),
 * reproduced here with the same Murmur3_x86_32 primitives (FunctionsSpec
 * proves equality; the engine feeds it sort_array(array_distinct(...)) of
 * non-null hashes, so its inputs qualify). Deliberate divergence at the
 * edges: NULL on a NULL/empty array or NULL element, where the builtin
 * yields k NULL entries for an empty input — spec-locked in FunctionsSpec.
 */
case class MinHashSig(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<int>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Int.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val base = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashInt(arr.getInt(i), 42)
      var j = 0
      while (j < k) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(j, base)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      val bad = ctx.freshName("bad")
      val m3 = "org.apache.spark.unsafe.hash.Murmur3_x86_32"
      s"""
         |int $n = $arr.numElements();
         |boolean $bad = $n == 0;
         |int[] $mins = new int[$k];
         |java.util.Arrays.fill($mins, Integer.MAX_VALUE);
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($arr.isNullAt($i)) { $bad = true; break; }
         |  int $base = $m3.hashInt($arr.getInt($i), 42);
         |  for (int $j = 0; $j < $k; $j++) {
         |    int $h = $m3.hashInt($j, $base);
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/**
 * Fused cosine similarity over two numeric array columns — the pair-verify
 * hot path (q28/q35/q44 and every IVF/LSH re-rank) evaluates cosine once
 * per candidate pair, which as a Column chain costs THREE [[DotProduct]]
 * calls (dot(a,b), dot(a,a), dot(b,b)): three traversals of the same two
 * buffers per pair. This expression accumulates all three sums in ONE loop
 * over the buffers and applies the identical IEEE tail
 * `d / (sqrt(na) * sqrt(nb))`.
 *
 * Bit-identical to `vec_dot(a,b)/(sqrt(vec_dot(a,a))*sqrt(vec_dot(b,b)))`
 * on non-degenerate input (FunctionsSpec proves it): each accumulator sees
 * the same additions in the same index order as its standalone loop, and
 * the division/multiply tail is the same three IEEE ops — fusing changes
 * the interleaving of independent accumulators, never the per-accumulator
 * sequence. NULL if either array is NULL, contains a NULL element, or
 * lengths differ (the chain's dot(a,b) is NULL then, which nulls the
 * division). Deliberate divergence on a ZERO vector: this expression
 * returns IEEE NaN (undefined direction), where the Column chain's Divide
 * raises DIVIDE_BY_ZERO under Spark 4's ANSI default — a similarity score
 * should not abort a 100 TB re-rank stage over one degenerate embedding;
 * callers filter/flag NaN. Spec-locked in FunctionsSpec.
 */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<float|double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = xa.numElements()
    if (n != xb.numElements()) return null
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || xb.isNullAt(i)) return null
      val va = if (ta == FloatType) xa.getFloat(i).toDouble else xa.getDouble(i)
      val vb = if (tb == FloatType) xb.getFloat(i).toDouble else xb.getDouble(i)
      d += va * vb
      na += va * va
      nb += vb * vb
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, t: DataType, i: String): String =
        if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $va = ${get(a, elemType(left).get, i)};
         |    double $vb = ${get(b, elemType(right).get, i)};
         |    $d += $va * $vb;
         |    $na += $va * $va;
         |    $nb += $vb * $vb;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = $d / (Math.sqrt($na) * Math.sqrt($nb)); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/**
 * |A ∩ B| for two SORTED-DISTINCT int arrays: a two-pointer merge count —
 * no hashing, no boxing, no output array. `size(array_intersect(a, b))`
 * builds a hash set AND materializes the common-elements array per pair;
 * this is the inner loop of every pair-verify stage (n-gram Jaccard,
 * LSH/SimHash verification), so the engine sorts each doc's hashed shingle
 * set ONCE (Dedup.hashedShingleSets) and pays a linear merge per pair.
 * Precondition: both arrays sorted ascending with distinct elements (what
 * sort_array(array_distinct(...)) produces); NULL on a NULL element.
 */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size requires two array<int> or two " +
          s"array<bigint> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (na, nb) = (xa.numElements(), xb.numElements())
    val long = isLong
    var (i, j, n) = (0, 0, 0)
    while (i < na && j < nb) {
      if (xa.isNullAt(i) || xb.isNullAt(j)) return null
      val (va, vb) =
        if (long) (xa.getLong(i), xb.getLong(j))
        else (xa.getInt(i).toLong, xb.getInt(j).toLong)
      if (va == vb) { n += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val bad = ctx.freshName("bad")
      val (jt, get) = if (isLong) ("long", "getLong") else ("int", "getInt")
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |boolean $bad = false;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { $bad = true; break; }
         |  $jt $va = $a.$get($i);
         |  $jt $vb = $b.$get($j);
         |  if ($va == $vb) { $n++; $i++; $j++; }
         |  else if ($va < $vb) { $i++; } else { $j++; }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $n; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}
