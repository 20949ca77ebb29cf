package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** Compiled per-series linear-recurrence folds for the sequential
  * time-series operators (ts5 EWMA, ts8 Holt, ts10 CUSUM).
  *
  * All three previously folded with the `aggregate` higher-order
  * function building `acc || array(named_struct(...))` — which is both
  * INTERPRETED (per-element lambda dispatch, the imp2/PackedPairs
  * lesson: any corpus-per-row HOF lambda is a kernel candidate) and
  * O(n²) per series, because each `||` append copies the whole
  * accumulator array. These kernels run the identical recurrence as a
  * flat primitive loop — O(n), no boxing — and emit the state
  * trajectory as a packed `array<double>` ([state0 per element, then
  * state1 per element], the BootWeightPair layout), which the operator
  * zips back to the sorted series with `posexplode` + `element_at`
  * (both codegen'd built-ins).
  *
  * Bit-exactness contract: each loop body reproduces the replaced SQL
  * lambda's arithmetic ORDER exactly (same literals, same
  * associativity, `math.max` ≡ `greatest` on non-NaN doubles), so the
  * DuckDB recursive-CTE oracles — which hash-match the old form —
  * hash-match these too; TimeSeriesSpec additionally pins each against
  * a driver-side sequential recompute.
  *
  * The fold input is the operator's `array_sort(collect_list(
  * struct(hr, v)))` column; the kernels read only the `v` field
  * (located by name, so struct layout changes fail loudly).
  */
object SeriesFoldUtil {

  /** e_t = α·v_t + (1−α)·e_{t−1}, e_1 = v_1 → [e_0..e_{n−1}]. */
  def ewma(arr: ArrayData, vIdx: Int, nf: Int, alpha: Double,
      oneMinusAlpha: Double): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Double](n)
    var e = 0.0
    var i = 0
    while (i < n) {
      val v = arr.getStruct(i, nf).getDouble(vIdx)
      e = if (i == 0) v else alpha * v + oneMinusAlpha * e
      out(i) = e
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Holt: l_t = α·v_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}; l_1 = v_1, b_1 = 0
    * → packed [l_0..l_{n−1}, b_0..b_{n−1}]. */
  def holt(arr: ArrayData, vIdx: Int, nf: Int, alpha: Double,
      oneMinusAlpha: Double, beta: Double, oneMinusBeta: Double): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Double](2 * n)
    var l = 0.0
    var b = 0.0
    var i = 0
    while (i < n) {
      val v = arr.getStruct(i, nf).getDouble(vIdx)
      if (i == 0) { l = v; b = 0.0 }
      else {
        val lNew = alpha * v + oneMinusAlpha * (l + b)
        b = beta * (lNew - l) + oneMinusBeta * b
        l = lNew
      }
      out(i) = l
      out(n + i) = b
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** CUSUM (Page 1954): S⁺_t = max(0, S⁺_{t−1} + v_t − μ − kσ),
    * S⁻_t = max(0, S⁻_{t−1} + μ − v_t − kσ), S⁺_0 = S⁻_0 = 0
    * → packed [sp_0..sp_{n−1}, sn_0..sn_{n−1}]. */
  def cusum(arr: ArrayData, vIdx: Int, nf: Int, mu: Double, sigma: Double,
      k: Double): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Double](2 * n)
    var sp = 0.0
    var sn = 0.0
    var i = 0
    while (i < n) {
      val v = arr.getStruct(i, nf).getDouble(vIdx)
      sp = math.max(0.0, sp + v - mu - k * sigma)
      sn = math.max(0.0, sn + mu - v - k * sigma)
      out(i) = sp
      out(n + i) = sn
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

sealed trait SeriesFoldInput { self: Expression =>
  def seriesChild: Expression
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  protected lazy val elemStruct: StructType = seriesChild.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  protected lazy val vIdx: Int = elemStruct.fieldIndex("v")
  protected lazy val numFields: Int = elemStruct.size
}

/** `graft_ewma_fold(srt)` with compile-time α. */
case class EwmaFold(child: Expression, alpha: Double)
    extends UnaryExpression with SeriesFoldInput {
  override def seriesChild: Expression = child
  override def prettyName: String = "graft_ewma_fold"
  override protected def nullSafeEval(a: Any): Any =
    SeriesFoldUtil.ewma(a.asInstanceOf[ArrayData], vIdx, numFields,
      alpha, 1 - alpha)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.SeriesFoldUtil.ewma($a, $vIdx, $numFields, $alpha, ${1 - alpha})")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_holt_fold(srt)` with compile-time α, β. */
case class HoltFold(child: Expression, alpha: Double, beta: Double)
    extends UnaryExpression with SeriesFoldInput {
  override def seriesChild: Expression = child
  override def prettyName: String = "graft_holt_fold"
  override protected def nullSafeEval(a: Any): Any =
    SeriesFoldUtil.holt(a.asInstanceOf[ArrayData], vIdx, numFields,
      alpha, 1 - alpha, beta, 1 - beta)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.SeriesFoldUtil.holt($a, $vIdx, $numFields, $alpha, ${1 - alpha}, $beta, ${1 - beta})")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_cusum_fold(srt, mu, sigma)` with compile-time k. */
case class CusumFold(first: Expression, second: Expression, third: Expression,
    k: Double) extends TernaryExpression with SeriesFoldInput {
  override def seriesChild: Expression = first
  override def prettyName: String = "graft_cusum_fold"
  override protected def nullSafeEval(a: Any, mu: Any, sigma: Any): Any =
    SeriesFoldUtil.cusum(a.asInstanceOf[ArrayData], vIdx, numFields,
      mu.asInstanceOf[Double], sigma.asInstanceOf[Double], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, mu, sigma) =>
      s"${ev.value} = org.apache.spark.sql.graft.SeriesFoldUtil.cusum($a, $vIdx, $numFields, $mu, $sigma, $k);")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Column-level entry points. */
object SeriesFoldExpr {
  def ewmaFold(srt: Column, alpha: Double): Column =
    ExpressionUtils.column(EwmaFold(ExpressionUtils.expression(srt), alpha))
  def holtFold(srt: Column, alpha: Double, beta: Double): Column =
    ExpressionUtils.column(
      HoltFold(ExpressionUtils.expression(srt), alpha, beta))
  def cusumFold(srt: Column, mu: Column, sigma: Column, k: Double): Column =
    ExpressionUtils.column(CusumFold(ExpressionUtils.expression(srt),
      ExpressionUtils.expression(mu), ExpressionUtils.expression(sigma), k))
}
