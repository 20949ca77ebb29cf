package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-document repetition digests — the whole unigram AND
  * bigram frequency profile in ONE call per document. Repetition
  * scoring is row-local (counts over THIS document's grams), so the
  * posexplode → (doc, gram) partial-count → per-doc re-aggregate
  * pipeline this replaces paid two corpus-token-count-sized shuffles
  * for a per-document value; the kernel folds both gram sizes in one
  * pass over the token array (same whitespace split as
  * [[WordNgramsUtil]], so the counts are bit-identical to the exploded
  * form and the DuckDB oracle), making the stage a zero-shuffle
  * scan+project — the MinHash32 move applied to frequency digests.
  * Per-row state is bounded by the document's gram vocabulary (web/
  * pipeline docs are KB-MB; t8's chunking is the upstream bound for
  * pathological documents — the same assumption every per-doc kernel
  * here makes).
  */
object RepetitionUtil {
  def stats(s: UTF8String): InternalRow = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length // split(-1) never yields 0 tokens
    val wc = new java.util.HashMap[String, Int](math.max(16, n * 2))
    var maxWc = 0
    var i = 0
    while (i < n) {
      val c = wc.merge(toks(i), 1, Integer.sum)
      if (c > maxWc) maxWc = c
      i += 1
    }
    var nBigrams = 0L
    var maxBc = 0
    if (n >= 2) {
      nBigrams = n - 1L
      val bc = new java.util.HashMap[String, Int](math.max(16, n * 2))
      i = 0
      while (i < n - 1) {
        val c = bc.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
        if (c > maxBc) maxBc = c
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      n.toLong, wc.size.toLong, maxWc.toLong, nBigrams, maxBc.toLong))
  }
}

/** Catalyst wrapper: `graft_repetition(text)` →
  * struct(n_words, n_distinct, max_wc, n_bigrams, max_bc), all longs
  * (n_bigrams/max_bc are 0 for single-token documents). */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_wc", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("max_bc", LongType, nullable = false)))

  override def prettyName: String = "graft_repetition"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionUtil.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RepetitionUtil.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  def repetitionStats(c: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(c)))
}
