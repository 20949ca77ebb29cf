package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Elementwise sum of `array<double>` values — the vector aggregate
  * Spark lacks (built-ins only sum scalars; summing embeddings
  * otherwise needs a posexplode + per-dimension groupBy, i.e. a
  * dim× row blow-up and an extra shuffle).
  *
  * A `TypedImperativeAggregate` over a primitive `Array[Double]`
  * buffer: update adds elementwise in array order, merge adds
  * buffers, and partial aggregation works as usual (map-side
  * combine), so a 100 TB centroid computation is one pass + one
  * shuffle of dim-length buffers per group. Ragged inputs are allowed
  * — the buffer grows to the longest vector seen.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_vector_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buffer.length < n) java.util.Arrays.copyOf(buffer, n) else buffer
    var i = 0
    while (i < n) { b(i) += arr.getDouble(i); i += 1 }
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
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

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorSumAggExpr {
  /** Column-level aggregate: elementwise sum of an array<double> column. */
  def vectorSum(c: Column): Column =
    ExpressionUtils.column(
      VectorSumAgg(ExpressionUtils.expression(c)).toAggregateExpression())
}
