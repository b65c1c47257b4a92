package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * Membership probe against a pre-built Bloom filter (graft.ops.BloomJoin's
 * probe side): `true` if the key MIGHT be in the builder's key set, `false`
 * only if it is DEFINITELY absent — the semi-join-reduction primitive.
 *
 * The filter arrives as its serialized byte image (the compact bitset the
 * driver broadcasts — `org.apache.spark.util.sketch.BloomFilter`'s own wire
 * format, the same sketch class `DataFrame.stat.bloomFilter` builds with a
 * distributed treeAggregate). Codegen deserializes it ONCE per generated
 * class into a mutable member — the per-row cost is the sketch's two hash
 * probes, fully inside whole-stage codegen; an equivalent Scala UDF would
 * box every key and capture the filter in a closure outside codegen.
 *
 * Key types: BIGINT probes `mightContainLong` (matching the builder's
 * `putLong` for integral columns) and STRING probes `mightContainBinary`
 * over UTF-8 bytes (matching `putBinary`) — the two encodings
 * `stat.bloomFilter` uses. Null key → null (nullSafeEval), mirroring a
 * join's treatment of null keys (never matches).
 */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires a bigint or string key, got ${t.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_contains"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => filter.mightContainLong(input.asInstanceOf[Long])
    case StringType =>
      filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", filterBytes, "byte[]")
    val bf = classOf[BloomFilter].getName
    val filterVar = ctx.addMutableState(bf, "bloomFilter", v =>
      s"""
         |try {
         |  $v = $bf.readFrom(new java.io.ByteArrayInputStream($bytesRef));
         |} catch (java.io.IOException e) {
         |  throw new RuntimeException(e);
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, input => child.dataType match {
      case LongType =>
        s"${ev.value} = $filterVar.mightContainLong($input);"
      case StringType =>
        s"${ev.value} = $filterVar.mightContainBinary($input.getBytes());"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
