package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization encoder: for each of `m` subspaces of
  * `dim/m` dims, the argmin-distance codebook index among `k`
  * centroids (flattened into one literal `array<double>` of
  * m×k×sub doubles, centroid-major within subspace).
  *
  * The expression-tree alternative (greatest() over m×k scored
  * structs, each a slice + literal dot) does the same math but as
  * ~m×k×4 Catalyst nodes — at m=16, k=16 that is a >1000-node
  * projection whose whole-stage code takes janino seconds to compile
  * and blows the JIT inline budget. One kernel node with a flat
  * triple loop keeps the math identical (squared L2, strict `<` so
  * ties pick the lowest k — the same rule as the driver-side trainer)
  * and the generated code tiny.
  */
case class PqEncode(vec: Expression, books: Expression, m: Int, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = vec
  override def right: Expression = books

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(v: Any, b: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val sub = cb.numElements() / (m * k)
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        var d = 0.0
        var j = 0
        while (j < sub) {
          val t = x.getDouble(mi * sub + j) - cb.getDouble((mi * k + ki) * sub + j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = ki }
        ki += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b) => {
      val sub = ctx.freshName("sub")
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |final int $sub = $b.numElements() / ${m * k};
         |final int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      final double $t = $v.getDouble($mi * $sub + $j)
         |        - $b.getDouble(($mi * $k + $ki) * $sub + $j);
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $ki; }
         |  }
         |  $codes[$mi] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, books = newRight)
}

object PqEncodeExpr {
  /** PQ codes (array<int>, length m) of an array<double> vector
    * against a flattened literal codebook. */
  def pqEncode(v: Column, books: Column, m: Int, k: Int): Column =
    ExpressionUtils.column(
      PqEncode(ExpressionUtils.expression(v), ExpressionUtils.expression(books), m, k))
}
