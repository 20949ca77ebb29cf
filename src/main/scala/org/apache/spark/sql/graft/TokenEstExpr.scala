package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled word-piece token estimate for t3:
  * Σ ceil(length(word)/4) over `split(text, ' ')` — one pass over the
  * document's UTF-8 bytes, replacing the interpreted per-word
  * `aggregate(split(...))` HOF fold (per-word lambda dispatch plus the
  * materialized split array on the corpus-per-row hot path).
  *
  * Exactness: word lengths are counted in CODE POINTS by counting
  * non-continuation UTF-8 bytes ((b & 0xC0) != 0x80), the same unit
  * Spark's `length()` uses (UTF8String.numChars) and DuckDB's
  * `length()` (the oracle). The split is on the single space byte
  * 0x20, which UTF-8 guarantees never appears inside a multi-byte
  * sequence; empty parts from consecutive spaces contribute
  * ceil(0/4) = 0, exactly as the HOF form's `split(text, ' ')` did.
  * ceil(len/4.0) for non-negative integer len is (len + 3) / 4 in
  * integer arithmetic — no doubles anywhere.
  */
object TokenEstUtil {
  def bpeEst(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var cur = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == 0x20) { acc += (cur + 3) / 4; cur = 0 }
      else if ((b & 0xC0) != 0x80) cur += 1
      i += 1
    }
    acc + (cur + 3) / 4
  }
}

/** Catalyst wrapper: `graft_bpe_est(text)` → bigint. */
case class BpeEst(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bpe_est"

  override protected def nullSafeEval(input: Any): Any =
    TokenEstUtil.bpeEst(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TokenEstUtil.bpeEst($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenEstExpr {
  def bpeEst(text: Column): Column =
    ExpressionUtils.column(BpeEst(ExpressionUtils.expression(text)))
}
