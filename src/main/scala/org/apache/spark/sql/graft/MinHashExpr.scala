package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled 32-slot MinHash signature of a text column — the whole
  * signature in ONE call per document. MinHash is row-local (distinct
  * word 3-gram shingles of THIS document, K permutation mins over
  * them), so the explode-shingles → corpus-wide DISTINCT → 32-min
  * aggregate pipeline this replaces paid two corpus shuffles for a
  * per-document value; the kernel dedups shingles in a per-row hash
  * set and folds the K mins in a flat loop, making the signature
  * stage a zero-shuffle scan+project. Cross-document work (the d2/d6
  * shingle equi-join) still uses the exploded form — only the
  * signature computation is row-local.
  *
  * Hash family preserved EXACTLY (DedupSpec pins bit-equality): slot
  * i of a shingle is Spark's multi-arg `xxhash64(i, shingle)` — an
  * int hashed at seed 42, whose result seeds the shingle's bytes
  * hash, matching XxHash64's left-to-right fold.
  */
object MinHashUtil {
  val K = 32

  def minhash32(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val mins = Array.fill(K)(Long.MaxValue)
    val m = toks.length - 2
    if (m <= 0) {
      // fewer than 3 tokens → no shingles; mirror the aggregate form,
      // where such docs simply had no rows (callers filter on this)
      return new GenericArrayData(Array.empty[Any])
    }
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < m) {
      val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      if (seen.add(sh)) {
        val bytes = UTF8String.fromString(sh)
        var k = 0
        while (k < K) {
          // Spark xxhash64(k, sh): int k at seed 42, then the string
          val h1 = XXH64.hashInt(k, 42L)
          val h = XXH64.hashUnsafeBytes(bytes.getBaseObject,
            bytes.getBaseOffset, bytes.numBytes(), h1)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Catalyst wrapper: `graft_minhash32(text)` → array<long> (empty for
  * docs with fewer than 3 tokens). */
case class MinHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash32"

  override protected def nullSafeEval(input: Any): Any =
    MinHashUtil.minhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MinHashUtil.minhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash32 {
  def minhash32(c: Column): Column =
    ExpressionUtils.column(MinHash32(ExpressionUtils.expression(c)))
}
