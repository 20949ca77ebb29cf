package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the sequential dot product of two
  * `array<double>` columns.
  *
  * This is the hot kernel of every similarity / near-dup operator: it
  * runs once per CANDIDATE PAIR (O(n²) in the bounded all-pairs form,
  * O(candidates) under LSH/IVF), so per-element overhead multiplies.
  * Spark's own options are both slow here: `aggregate`/`zip_with`
  * lambdas are evaluated interpreted per element, and an unrolled
  * `getItem`-per-index tree pays ~100 expression-node evaluations per
  * pair. `doGenCode` instead emits a flat primitive `for` loop over
  * the two `ArrayData` backings — whole-stage-codegen friendly, no
  * boxing, no per-element dispatch.
  *
  * Accumulation is left-to-right in array order, so results are
  * bit-identical to DuckDB's `list_dot_product` (the oracle) and to
  * the interpreted HOF form it replaces.
  *
  * Lives under `org.apache.spark.sql.graft` (not `graft.functions`)
  * because the `Column ↔ Expression` bridge and `AbstractDataType`
  * are `private[sql]`; a subpackage of `org.apache.spark.sql` is the
  * standard extension-library access point.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
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
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L1 distance of two `array<int>` columns — m5's hamming score over
  * thermometer-quantized pHash codes (hamming on unary codes ≡ L1 on
  * the quantized features). Runs once per band-collision CANDIDATE
  * PAIR, where the `aggregate(zip_with(...))` HOF form it replaces
  * paid interpreted per-element lambda dispatch plus a materialized
  * intermediate diff array. Same flat-loop shape as [[DotProduct]];
  * integer accumulation is order-free, so equivalence to the SQL
  * oracle's `list_sum(list_transform(...))` is exact. */
case class L1DistInt(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_l1_int"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      acc += math.abs(x.getInt(i) - y.getInt(i))
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
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Math.abs($a.getInt($i) - $b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native array-math kernels. */
object ArrayMathExpr {
  /** Sequential dot product of two array<double> columns via the
    * codegen'd [[DotProduct]] kernel. */
  def dotNative(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** L1 distance of two array<int> columns via the codegen'd
    * [[L1DistInt]] kernel. */
  def l1Native(a: Column, b: Column): Column =
    ExpressionUtils.column(
      L1DistInt(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
