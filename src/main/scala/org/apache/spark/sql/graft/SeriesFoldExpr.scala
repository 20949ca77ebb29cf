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

object LttbUtil {

  /** LTTB downsampling (Steinarsson 2013) on the exact integer grid:
    * selects `nOut` of the series' points (1-based indices into the
    * sorted array) — first and last always kept, each of the nOut−2
    * middle buckets contributes the point maximizing the triangle
    * area with the previously selected anchor and the NEXT bucket's
    * centroid. Exactness: x = the point's 1-based rank, y = the
    * 1e-6-quantized value (the hourly v is already 6-dp rounded, so
    * floor(v·1e6+0.5) recovers its integer exactly); the area
    * comparison runs in BigInt — cross-multiplied by the next
    * bucket's count so the centroid never becomes a double — which
    * the DuckDB oracle mirrors in HUGEINT (x·cnt·y products pass
    * int64 around ~1e5-hour spines, so 128-bit is the safe grain on
    * both sides). Ties break on the earliest index (strict >), the
    * same ORDER BY area DESC, i ASC the oracle uses. Cost is O(n)
    * per series + O(candidates) BigInt compares — the series is the
    * BOUNDED hourly spine, never the raw corpus. */
  def lttb(arr: ArrayData, vIdx: Int, nf: Int, nOut: Int): ArrayData = {
    val n = arr.numElements()
    val ys = new Array[Long](n)
    var i = 0
    while (i < n) {
      ys(i) = math.floor(
        arr.getStruct(i, nf).getDouble(vIdx) * 1e6 + 0.5).toLong
      i += 1
    }
    if (n <= nOut) {
      val out = new Array[Long](n)
      var j = 0
      while (j < n) { out(j) = j + 1; j += 1 }
      return UnsafeArrayData.fromPrimitiveArray(out)
    }
    val t2 = nOut - 2
    // bucket of middle index i (2..n−1) is ((i−2)·t2)/(n−2)+1; the
    // first index of bucket k is therefore ceil((k−1)(n−2)/t2)+2
    def lo(k: Int): Int =
      (((k - 1).toLong * (n - 2) + t2 - 1) / t2).toInt + 2
    val sx = new Array[Long](t2 + 2)
    val sy = new Array[Long](t2 + 2)
    val cn = new Array[Long](t2 + 2)
    i = 2
    while (i <= n - 1) {
      val b = (((i - 2).toLong * t2) / (n - 2)).toInt + 1
      sx(b) += i; sy(b) += ys(i - 1); cn(b) += 1
      i += 1
    }
    val out = new Array[Long](nOut)
    out(0) = 1
    var anchor = 1
    var k = 1
    while (k <= t2) {
      val (csx, csy, ccnt) =
        if (k < t2) (sx(k + 1), sy(k + 1), cn(k + 1))
        else (n.toLong, ys(n - 1), 1L)
      val xa = BigInt(anchor)
      val ya = BigInt(ys(anchor - 1))
      val p = xa * ccnt - csx
      val q = BigInt(csy) - ya * ccnt
      var best = BigInt(-1)
      var besti = -1
      var c = lo(k)
      val hi = if (k < t2) lo(k + 1) - 1 else n - 1
      while (c <= hi) {
        val area = (p * (BigInt(ys(c - 1)) - ya) - (xa - c) * q).abs
        if (area > best) { best = area; besti = c }
        c += 1
      }
      out(k) = besti
      anchor = besti
      k += 1
    }
    out(nOut - 1) = n
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

/** `graft_lttb_fold(srt)` with compile-time output size — returns the
  * selected 1-based indices as `array<long>` (an index list, not a
  * state trajectory, hence the LongType override). */
case class LttbFold(child: Expression, nOut: Int)
    extends UnaryExpression with SeriesFoldInput {
  override def seriesChild: Expression = child
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_lttb_fold"
  override protected def nullSafeEval(a: Any): Any =
    LttbUtil.lttb(a.asInstanceOf[ArrayData], vIdx, numFields, nOut)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.LttbUtil.lttb($a, $vIdx, $numFields, $nOut)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
  def lttbFold(srt: Column, nOut: Int): Column =
    ExpressionUtils.column(LttbFold(ExpressionUtils.expression(srt), nOut))
}
