package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled word n-gram builder shared by interpreted eval and
  * generated code (codegen emits a call to the static forwarder). */
object WordNgramsUtil {
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Whitespace word n-grams of a string column as `array<string>`
  * (space-joined; a text with fewer than n tokens yields an empty
  * array, so `explode` naturally drops it).
  *
  * This feeds every shingle-based operator (n-gram Jaccard, MinHash
  * banding, top-K n-gram frequency, SimHash tokenization), where the
  * built-in alternative — `transform(sequence(0, size(t)-n), i ->
  * concat_ws(' ', t[i], ...))` — re-evaluates an interpreted lambda
  * per shingle AND indexes the token array per element. Here the whole
  * row is one call into compiled code; `doGenCode` emits a static call
  * so the surrounding stage stays inside whole-stage codegen.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramsUtil.wordNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordNgramsUtil.wordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DISTINCT word n-grams of one document, deduped in-row (first-
  * occurrence order). Per-document dedup is row-local, so the
  * `explode(ngrams) → corpus-wide DISTINCT` pipeline this replaces
  * paid a full (doc, shingle) shuffle for a per-row set operation —
  * with doc_id in every key, that DISTINCT was exactly per-doc dedup.
  * Same tokenization as [[WordNgramsUtil]], so the exploded set is
  * identical (DedupSpec pins set-equality). */
object DistinctWordNgramsUtil {
  def distinctWordNgrams(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.max(16, m * 2))
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Catalyst wrapper: `graft_distinct_ngrams(text, n)` →
  * array<string> of the document's distinct n-grams. */
case class DistinctWordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_distinct_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    DistinctWordNgramsUtil.distinctWordNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DistinctWordNgramsUtil.distinctWordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramsExpr {
  /** Column-level wrapper: word n-grams via [[WordNgrams]]. */
  def wordNgrams(c: Column, n: Int): Column =
    ExpressionUtils.column(WordNgrams(ExpressionUtils.expression(c), n))

  /** Column-level wrapper: in-row-deduped n-grams via
    * [[DistinctWordNgrams]]. */
  def distinctWordNgrams(c: Column, n: Int): Column =
    ExpressionUtils.column(DistinctWordNgrams(ExpressionUtils.expression(c), n))
}
