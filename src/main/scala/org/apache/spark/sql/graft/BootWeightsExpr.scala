package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Compiled Poisson-bootstrap weight row for imp2: one call emits the
  * row's full B-element (weight, weight·value) pair as a
  * struct-of-arrays substitute — two primitive double[]s packed as
  * one 2B-long array [w₀..w_{B−1}, w₀·v..w_{B−1}·v] so a single
  * expression feeds both VectorSumAgg legs after an in-plan slice.
  *
  * Replaces the nested `transform(transform(sequence…))` + `zip_with`
  * SQL-lambda chain: higher-order functions run their lambdas
  * INTERPRETED, which put ~rows×B×3 closure dispatches on imp2's hot
  * path. The hash is bit-identical to the SQL form it replaces
  * (`pmod(xxhash64(event_id, b), 1e6)/1e6` — XXH64 chained over the
  * two long inputs with Spark's seed 42), so the bootstrap stays
  * deterministic and re-runnable; the inverse-CDF ladder is the same
  * Poisson(1) table.
  */
object BootWeightsUtil {
  /** Poisson(1) CDF for k = 0..5; k = 6 is the tail. Mirrors
    * graft.operators.Quality.PoissonCdf (asserted equal by spec). */
  val PoissonCdf: Array[Double] =
    Array(0.36787944, 0.73575888, 0.91969860, 0.98101184, 0.99634015,
      0.99940582)

  def bootWeightPair(eventId: Long, value: Double, b: Int): ArrayData = {
    val out = new Array[Double](2 * b)
    val h0 = XXH64.hashLong(eventId, 42L)
    var i = 0
    while (i < b) {
      // the replicate index was an INT in the SQL form (sequence(0,
      // B−1) yields IntegerType), so the chained hash step is hashInt
      val h = XXH64.hashInt(i, h0)
      val m = h % 1000000L
      val u = (if (m < 0) m + 1000000L else m) / 1000000.0
      var k = 0
      while (k < PoissonCdf.length && u >= PoissonCdf(k)) k += 1
      val w = k.toDouble
      out(i) = w
      out(b + i) = w * value
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Catalyst wrapper: `graft_boot_weights(event_id, value)` →
  * array<double> of length 2B: weights then weight·value. */
case class BootWeightPair(left: Expression, right: Expression, b: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(b >= 1, s"replicate count must be >= 1, got $b")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_boot_weights"

  override protected def nullSafeEval(id: Any, v: Any): Any =
    BootWeightsUtil.bootWeightPair(
      id.asInstanceOf[Long], v.asInstanceOf[Double], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (idc, vc) =>
      s"org.apache.spark.sql.graft.BootWeightsUtil.bootWeightPair($idc, $vc, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BootWeightsExpr {
  def bootWeightPair(id: Column, value: Column, b: Int): Column =
    ExpressionUtils.column(BootWeightPair(
      ExpressionUtils.expression(id), ExpressionUtils.expression(value), b))
}
