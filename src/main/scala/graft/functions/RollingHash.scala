package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Document-fingerprinting primitive (north-star text-analysis op): a
 * polynomial rolling hash (Rabin–Karp, base 31 over UTF-8 bytes, mod 2^64 by
 * natural Long wraparound) as a NATIVE Catalyst expression with full
 * whole-stage codegen — demonstrating the preferred extension tier of
 * SURVEY §7.3 (native Expression > UDF). Equivalent work as a Scala UDF
 * would box every row and break the codegen stage.
 */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 31L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $input.getBytes();
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value}_acc = ${ev.value}_acc * 31L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Registration helpers: temp-functions for a live session, plus a
  * SparkSessionExtensions installer for `spark.sql.extensions`. */
object GraftFunctions {
  /** Idempotent: a session built with
    * `spark.sql.extensions=graft.functions.GraftExtensions` (or one this
    * method already visited) is left untouched, so repeated calls from
    * operator code neither re-register nor warn. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def ensure(name: String,
               builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    ensure("rolling_hash", exprs => RollingHash(exprs.head))
    ensure("vec_dot", exprs => DotProduct(exprs.head, exprs(1)))
    ensure("cosine_sim", exprs => CosineSim(exprs.head, exprs(1)))
    ensure("simhash64", exprs => SimHash64(exprs.head))
    ensure("minhash_sig", exprs => MinHashSig(exprs.head,
      exprs(1).eval().asInstanceOf[Int]))
    ensure("sorted_intersect_size",
      exprs => SortedIntersectSize(exprs.head, exprs(1)))
    ensure("morton_key", exprs => MortonKey(exprs.head, exprs(1)))
    ensure("bloom_contains", exprs => BloomMightContain(exprs.head,
      exprs(1).eval().asInstanceOf[Array[Byte]]))
    ensure("hamming_bucket_pairs", exprs => HammingBucketPairs(exprs.head,
      exprs(1), exprs(2).eval().asInstanceOf[Int]))
    ensure("ngram_hashes", exprs => NgramHashes(exprs.head,
      exprs(1).eval().asInstanceOf[Int]))
    ensure("jaro_winkler", exprs => JaroWinkler(exprs.head, exprs(1)))
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` installs the
  * functions permanently, plus the semantics-preserving optimizer rules of
  * `graft.plans` (RegexExistenceRewrite, DisjunctiveJoinRewrite) and the
  * as-of planner strategy — both Catalyst extension tiers ride the one
  * entry point. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs.head, exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("morton_key"),
      new ExpressionInfo(classOf[MortonKey].getName, "morton_key"),
      (exprs: Seq[Expression]) => MortonKey(exprs.head, exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_contains"),
      (exprs: Seq[Expression]) => BloomMightContain(exprs.head,
        exprs(1).eval().asInstanceOf[Array[Byte]])))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("hamming_bucket_pairs"),
      new ExpressionInfo(classOf[HammingBucketPairs].getName,
        "hamming_bucket_pairs"),
      (exprs: Seq[Expression]) => HammingBucketPairs(exprs.head,
        exprs(1), exprs(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
      (exprs: Seq[Expression]) => NgramHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs.head, exprs(1))))
    // tier-c Catalyst extensions: optimizer rewrites + the native as-of
    // physical operator (see graft.plans). PkFkJoinElimination is NOT
    // injected — it is result-changing without declared constraints and
    // stays opt-in via ConstraintCatalog.
    ext.injectOptimizerRule(_ => graft.plans.RegexExistenceRewrite)
    ext.injectOptimizerRule(_ => graft.plans.DisjunctiveJoinRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
