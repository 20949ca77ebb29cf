package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Native binary search into a SORTED (non-decreasing) `array<double>`:
  * returns the count of elements strictly less than the probe value —
  * exactly `size(filter(cuts, c -> v > c))`, the bucket-assignment
  * fold every histogram/equi-depth operator uses, but in O(log B)
  * instead of the HOF's O(B) interpreted lambda dispatches per row.
  *
  * This is what makes a DATA-PROPORTIONAL bucket fan-out viable
  * (r13 verdict ask #1): with the cut count B derived from the row
  * count (fixed rows per bucket), B reaches ~3·10⁵ at 100 TB grain —
  * a per-row linear scan of the cut array would cost B comparisons
  * per corpus row (the plan-killer), while the binary search costs
  * ~18. Left child is the (broadcast-literal or 1-row-cross-joined)
  * sorted cut array; right child is the probed value. On a
  * non-decreasing array with duplicate cuts the returned index is the
  * lower bound, which equals the strict-less count — identical to the
  * HOF form's answer, so swapping forms cannot move a row's bucket
  * (KernelPropertySpec pins equivalence on random data with dups). */
case class SearchSortedD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_search_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[Double]
    var lo = 0
    var hi = xs.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v > xs.getDouble(mid)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements();
         |while ($lo < $hi) {
         |  final int $mid = ($lo + $hi) >>> 1;
         |  if ($b > $a.getDouble($mid)) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry point for [[SearchSortedD]]. */
object SearchSortedExpr {
  /** Count of elements in the sorted array column `cuts` strictly
    * below `v` — the O(log B) bucket assignment. */
  def searchSorted(cuts: Column, v: Column): Column =
    ExpressionUtils.column(
      SearchSortedD(ExpressionUtils.expression(cuts), ExpressionUtils.expression(v)))
}
