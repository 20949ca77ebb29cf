package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Gram-matrix aggregate: Σ x·xᵀ over an `array<double>` column,
  * returned as the row-major flattened d×d matrix.
  *
  * This is the one-pass reduction that makes distributed PCA (and any
  * covariance-based analysis) scale: the d²-double buffer is the ONLY
  * state, it combines associatively (map-side partials, one shuffle of
  * d² doubles per group — corpus rows never move), and the
  * eigendecomposition downstream runs on the driver against a d×d
  * matrix regardless of corpus size. The update loop is d² fused
  * multiply-adds on a primitive buffer — no per-row outer-product
  * array is ever materialized (a `transform`-HOF formulation would
  * allocate and interpret a d²-element array per row).
  *
  * First input fixes the dimension; later rows must match (ragged
  * embedding corpora are a data bug worth failing loudly on, unlike
  * [[VectorSumAgg]]'s permissive padding which predates this).
  */
case class GramMatrixAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_gram_matrix"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (d == 0) return buffer
    val b =
      if (buffer.isEmpty) new Array[Double](d * d)
      else {
        require(buffer.length == d * d,
          s"graft_gram_matrix: ragged input — saw dim $d after dim " +
            s"${math.sqrt(buffer.length).toInt}")
        buffer
      }
    val x = arr.toDoubleArray()
    var i = 0
    while (i < d) {
      val xi = x(i)
      if (xi != 0.0) { // exploit sparsity; row base precomputed
        val base = i * d
        var j = 0
        while (j < d) { b(base + j) += xi * x(j); j += 1 }
      }
      i += 1
    }
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    require(b1.length == b2.length,
      s"graft_gram_matrix: merging buffers of dims ${b1.length}/${b2.length}")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object GramMatrixAggExpr {
  /** Column-level aggregate: Σ x·xᵀ of an array<double> column,
    * flattened row-major. */
  def gramMatrix(c: Column): Column =
    ExpressionUtils.column(
      GramMatrixAgg(ExpressionUtils.expression(c)).toAggregateExpression())
}
