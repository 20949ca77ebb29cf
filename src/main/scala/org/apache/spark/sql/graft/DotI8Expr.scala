package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, LongType}

/** Native dot product of two `array<tinyint>` int8 code vectors —
  * the scoring kernel for quantized similarity search (n8). The
  * accumulator is a long (max |q|=127 → a term is ≤16129, so 2^63
  * overflows only past ~5.7e14 dimensions): pure integer multiply-add
  * over byte arrays, which is both the 4×-smaller-data path (vs
  * float64 vectors, see [[QuantizeI8]]) and the JIT's favorite loop
  * (vectorizable multiply-accumulate, no FP rounding). Exact by
  * construction — integer arithmetic has no summation-order issues,
  * so the ScalaTest reference recompute matches bit-for-bit.
  */
case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot_i8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotI8 {
  /** Column entry point: int8-code dot product (long result). */
  def dotI8(a: Column, b: Column): Column =
    ExpressionUtils.column(DotI8(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
