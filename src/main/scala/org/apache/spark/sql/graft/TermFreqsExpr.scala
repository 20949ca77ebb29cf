package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-document term-frequency table — every (term, tf) pair
  * of ONE document from one call. Term frequency is row-local, so the
  * explode-every-token → groupBy(doc, term) pipeline this replaces
  * shuffled the corpus's full token stream to count within documents;
  * the kernel counts in a per-row hash map (same whitespace split as
  * [[WordNgramsUtil]], first-occurrence order, so the exploded multiset
  * is identical) and the downstream explode is a pure projection —
  * corpus-wide work (document frequency, surprisal totals) still
  * aggregates on the term key, but over one deduped row per (doc,
  * term) instead of one row per token. Per-row state is bounded by the
  * document's vocabulary (the RepetitionStats assumption; t8 chunking
  * is the upstream bound for pathological docs).
  */
object TermFreqsUtil {
  def termFreqs(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val counts = new java.util.LinkedHashMap[String, Long](math.max(16, toks.length * 2))
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, java.lang.Long.sum)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst wrapper: `graft_term_freqs(text)` →
  * array<struct<term: string, tf: bigint>> in first-occurrence order. */
case class TermFreqs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_term_freqs"

  override protected def nullSafeEval(input: Any): Any =
    TermFreqsUtil.termFreqs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TermFreqsUtil.termFreqs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermFreqsExpr {
  def termFreqs(c: Column): Column =
    ExpressionUtils.column(TermFreqs(ExpressionUtils.expression(c)))
}

/** Compiled per-document word n-gram frequency table — the n-gram
  * generalization of [[TermFreqsUtil]] (n=1 produces the identical
  * multiset): every (ngram, tf) pair of one document from one call,
  * n-grams space-joined exactly like [[WordNgramsUtil.wordNgrams]].
  * Downstream corpus aggregates (bigram counts, conditional LM
  * probabilities) then move one row per (doc, ngram) instead of one
  * row per occurrence — the same shuffle-mass reduction TermFreqs
  * bought t16/t17, applied to the n-gram plane (t20). */
object NgramFreqsUtil {
  def ngramFreqs(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[String, Long](math.max(16, m * 2))
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1L, java.lang.Long.sum)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst wrapper: `graft_ngram_freqs(text, n)` →
  * array<struct<ngram: string, tf: bigint>> in first-occurrence order. */
case class NgramFreqs(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ngram", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_ngram_freqs"

  override protected def nullSafeEval(input: Any): Any =
    NgramFreqsUtil.ngramFreqs(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NgramFreqsUtil.ngramFreqs($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramFreqsExpr {
  def ngramFreqs(c: Column, n: Int): Column =
    ExpressionUtils.column(NgramFreqs(ExpressionUtils.expression(c), n))
}
