package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled 64-bit SimHash of a text column, whole signature in ONE
  * call per document. The previous formulation exploded the corpus to
  * token rows and pushed them through a 64-column vote aggregate —
  * i.e. a full corpus shuffle just to compute a per-document value.
  * SimHash is row-local by definition, so the kernel does the entire
  * tokenize → hash → vote → assemble cycle in a flat loop and the
  * signature stage becomes a zero-shuffle scan+project: at 100 TB
  * that removes corpus×tokens shuffled rows from the plan entirely.
  *
  * Semantics: whitespace tokens (same split as [[WordNgramsUtil]]
  * with n=1, per-OCCURRENCE votes), token hash = XXH64 over the
  * token's UTF-8 bytes with seed 42 (Spark's own `xxhash64` default
  * seed, making the kernel's family equal to the SQL
  * `xxhash64(tok)` the aggregate form used), bit i of the signature
  * set iff the i-th vote sum is positive.
  */
object SimHashUtil {
  def simhash64(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    // split(" ", -1): same token stream (incl. empty tokens) as the
    // WordNgrams(n=1) explode this kernel replaces
    val toks = s.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val tok = UTF8String.fromString(toks(t))
      val h = XXH64.hashUnsafeBytes(tok.getBaseObject, tok.getBaseOffset,
        tok.numBytes(), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** Catalyst expression wrapper: `graft_simhash64(text)` → long. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SimHashUtil.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(c: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(c)))
}
