package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Compiled per-query MMR greedy selection (Carbonell & Goldstein
  * 1998) — the n11 re-rank step, run ON THE EXECUTOR over each query's
  * collected candidate pool instead of on the driver over a global
  * `.collect()` (the r10 watch item: a large online query batch
  * serialized on the driver; per-query folds scale with executors).
  *
  * Input: the group's `collect_list(struct(vec_id, cos_raw, v, nrm))`
  * (bounded by MmrPool per query — the same bound the driver loop
  * had). Output: `array<struct<neighbor_id, mmr_rank, cosine>>` of the
  * k picks in selection order.
  *
  * The loop reproduces the retired driver implementation exactly —
  * candidates visited in (-relevance, id) order, pick maximizes
  * (λ·rel − (1−λ)·maxRedundancy, −id) with first-wins ties, relevance
  * rounded via BigDecimal HALF_UP at 6dp — so the operator's output is
  * bit-identical to every sealed artifact (pinned by ObtSampleSpec's
  * driver recompute).
  */
object MmrUtil {

  def mmr(arr: ArrayData, idIdx: Int, cosIdx: Int, vIdx: Int, nrmIdx: Int,
      nf: Int, k: Int, lam: Double): ArrayData = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val vecs = new Array[Array[Double]](n)
    val nrms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val st = arr.getStruct(i, nf)
      ids(i) = st.getLong(idIdx)
      rel(i) = st.getDouble(cosIdx)
      vecs(i) = st.getArray(vIdx).toDoubleArray()
      nrms(i) = st.getDouble(nrmIdx)
      i += 1
    }
    val order = Array.range(0, n).sortBy(j => (-rel(j), ids(j)))
    def cos(a: Int, b: Int): Double = {
      val va = vecs(a); val vb = vecs(b)
      var d = 0.0
      var t = 0
      while (t < va.length) { d += va(t) * vb(t); t += 1 }
      if (nrms(a) == 0 || nrms(b) == 0) 0.0 else d / (nrms(a) * nrms(b))
    }
    // running max-redundancy per candidate, updated on each pick: the
    // max over the selected set is order-insensitive, so this O(k·n)
    // form equals the driver loop's per-round max recompute. Seeded at
    // -inf, NOT 0: a candidate anti-correlated with everything selected
    // has NEGATIVE redundancy, which MMR rewards — clamping at zero
    // silently re-ranks toward plain relevance order
    val red = Array.fill(n)(Double.NegativeInfinity)
    val picked = new Array[Boolean](n)
    val out = new Array[Any](math.min(k, n))
    var sel = 0
    while (sel < k && sel < n) {
      var bestJ = -1
      var bestScore = Double.NegativeInfinity
      var bestNegId = Long.MinValue
      var oi = 0
      while (oi < n) {
        val j = order(oi)
        if (!picked(j)) {
          val redundancy = if (sel == 0) 0.0 else red(j)
          val score = lam * rel(j) - (1 - lam) * redundancy
          if (score > bestScore ||
            (score == bestScore && -ids(j) > bestNegId)) {
            bestScore = score
            bestNegId = -ids(j)
            bestJ = j
          }
        }
        oi += 1
      }
      picked(bestJ) = true
      var u = 0
      while (u < n) {
        if (!picked(u)) {
          val c = cos(u, bestJ)
          if (c > red(u)) red(u) = c
        }
        u += 1
      }
      out(sel) = new GenericInternalRow(Array[Any](ids(bestJ), sel + 1,
        BigDecimal(rel(bestJ))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      sel += 1
    }
    new GenericArrayData(out.take(sel))
  }
}

/** `graft_mmr(cands)` with compile-time k and λ. */
case class Mmr(child: Expression, k: Int, lam: Double)
    extends UnaryExpression {
  override def prettyName: String = "graft_mmr"
  private lazy val elemStruct: StructType = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val idIdx = elemStruct.fieldIndex("vec_id")
  private lazy val cosIdx = elemStruct.fieldIndex("cos_raw")
  private lazy val vIdx = elemStruct.fieldIndex("v")
  private lazy val nrmIdx = elemStruct.fieldIndex("nrm")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("mmr_rank", IntegerType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    MmrUtil.mmr(a.asInstanceOf[ArrayData], idIdx, cosIdx, vIdx, nrmIdx,
      elemStruct.size, k, lam)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.MmrUtil.mmr($a, $idIdx, $cosIdx, $vIdx, $nrmIdx, ${elemStruct.size}, $k, $lam)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MmrExpr {
  def mmr(cands: Column, k: Int, lam: Double): Column =
    ExpressionUtils.column(Mmr(ExpressionUtils.expression(cands), k, lam))
}
