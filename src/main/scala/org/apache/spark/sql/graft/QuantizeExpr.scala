package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native symmetric int8 quantization of an `array<double>` embedding:
  * one flat compiled loop computes the scale (max |v_i|), the
  * quantized codes q_i = round_half_away(v_i · 127 / scale), and the
  * L2 reconstruction error — the storage-compression kernel for
  * embedding corpora (int8 cuts vector bytes 8× vs float64 / 4× vs
  * float32, which at 100 TB is the difference between a corpus that
  * fits the cluster's NVMe tier and one that doesn't).
  *
  * Emits a struct so one pass yields both the codes (for writing) and
  * the audit digests (for oracle checking): scale, q (array<tinyint>),
  * sum/min/max of q, and the sequential L2 error. Rounding is
  * half-AWAY-FROM-ZERO (not Math.round's half-up-toward-+inf), matching
  * DuckDB's `round()` and BigDecimal HALF_UP, so the codes are
  * bit-identical to the SQL oracle. Like [[DotProduct]], the loop body
  * avoids per-element lambda dispatch; the only allocation is the
  * output row (once per vector).
  */
case class QuantizeI8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("sum_q", LongType, nullable = false),
    StructField("min_q", IntegerType, nullable = false),
    StructField("max_q", IntegerType, nullable = false),
    StructField("err", DoubleType, nullable = false)))

  override def prettyName: String = "graft_quantize_i8"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    InternalRow.fromSeq(QuantizeI8.quantize(v))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val row = ctx.freshName("row")
      s"""
         |Object[] $row = org.apache.spark.sql.graft.QuantizeI8.quantizeJava($a);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($row);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeI8 {
  /** The shared kernel: one pass for scale, one for codes + error.
    * Called from both interpreted eval and generated code (the loop
    * lives here rather than in emitted source — it is called once per
    * ROW, so the JIT inlines it; what matters is avoiding per-ELEMENT
    * expression dispatch, and it does). */
  def quantizeJava(v: ArrayData): Array[AnyRef] = {
    val n = v.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i))
      if (a > scale) scale = a
      i += 1
    }
    val q = new Array[Byte](n)
    var sumQ = 0L
    var minQ = Int.MaxValue
    var maxQ = Int.MinValue
    var errSq = 0.0
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val qi: Int =
        if (scale == 0.0) 0
        else {
          val t = x * 127.0 / scale
          // half away from zero, matching DuckDB round() and HALF_UP
          (if (t >= 0) math.floor(t + 0.5) else math.ceil(t - 0.5)).toInt
        }
      q(i) = qi.toByte
      sumQ += qi
      if (qi < minQ) minQ = qi
      if (qi > maxQ) maxQ = qi
      val d = x - (if (scale == 0.0) 0.0 else qi * scale / 127.0)
      errSq += d * d
      i += 1
    }
    if (n == 0) { minQ = 0; maxQ = 0 }
    Array(
      java.lang.Double.valueOf(scale),
      new GenericArrayData(q),
      java.lang.Long.valueOf(sumQ),
      java.lang.Integer.valueOf(minQ),
      java.lang.Integer.valueOf(maxQ),
      java.lang.Double.valueOf(math.sqrt(errSq)))
  }

  def quantize(v: ArrayData): Seq[Any] = quantizeJava(v).toSeq

  /** Column entry point. */
  def quantizeI8(v: Column): Column =
    ExpressionUtils.column(QuantizeI8(ExpressionUtils.expression(v)))
}
