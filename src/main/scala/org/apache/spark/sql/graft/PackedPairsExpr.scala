package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Compiled ordered-pair generator for the basket/co-occurrence
  * family (b1/b2/g3/g4): every (i < j) pair of ONE sorted int64 array
  * packed into a single int64 key (a·2³² + b — valid while ids <
  * 2³¹, the established packed-key discipline) from one call.
  *
  * Replaces the `flatten(transform(sequence …, i -> transform(slice
  * …)))` SQL-lambda chain: higher-order functions evaluate their
  * lambdas INTERPRETED (per-element closure dispatch outside
  * whole-stage codegen) and the nested `slice` copies the array tail
  * once per outer index — overhead quadratic in basket size riding on
  * top of the already-quadratic pair mass. This kernel is one flat
  * compiled double loop writing a primitive long[] (UnsafeArrayData,
  * no boxing). Pair SEMANTICS are identical: input sorted ascending ⇒
  * high word is the smaller element, u < v canonical.
  */
object PackedPairsUtil {
  def packedPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val hi = arr.getLong(i) << 32
      var j = i + 1
      while (j < n) {
        out(k) = hi | arr.getLong(j)
        k += 1
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Catalyst wrapper: `graft_packed_pairs(sorted_ids)` →
  * array<bigint> of (a·2³² | b) keys for all a-before-b pairs. */
case class PackedPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_packed_pairs"

  override protected def nullSafeEval(input: Any): Any =
    PackedPairsUtil.packedPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PackedPairsUtil.packedPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackedPairsExpr {
  def packedPairs(c: Column): Column =
    ExpressionUtils.column(PackedPairs(ExpressionUtils.expression(c)))
}
