package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Fused 32-bit Morton (Z-order) interleave of two long columns' low 16
 * bits — the native-expression tier of [[graft.ops.ZOrder]] (SURVEY
 * §7.3). The builtin formulation is a 10-step shift/mask Column chain
 * (q57's gate proves its arithmetic); this is the same five magic-number
 * spreads per operand fused into straight-line Java — one expression
 * node instead of ~20, which matters when the key is computed inside a
 * repartitionByRange sampling pass AND the write pass of a layout job.
 *
 * Bit-identical to [[graft.ops.ZOrder.zkey2]] (FunctionsSpec proves
 * equality across the full 16-bit corner set and random longs, including
 * negative inputs — `& 0xFFFF` truncation first, like the chain).
 */
case class MortonKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"morton_key requires two bigint arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "morton_key"

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    (v | (v << 1)) & 0x55555555L
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def gen(src: String, out: String): String =
        s"""
           |long $out = $src & 0xFFFFL;
           |$out = ($out | ($out << 8)) & 0x00FF00FFL;
           |$out = ($out | ($out << 4)) & 0x0F0F0F0FL;
           |$out = ($out | ($out << 2)) & 0x33333333L;
           |$out = ($out | ($out << 1)) & 0x55555555L;
         """.stripMargin
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      s"""
         |${gen(a, sx)}
         |${gen(b, sy)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonKey =
    copy(left = newLeft, right = newRight)
}
