package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern dictionary matcher (Aho & Corasick 1975, "Efficient
  * String Matching: An Aid to Bibliographic Search"): all dictionary
  * phrases are counted in ONE left-to-right pass over the text,
  * whatever the dictionary size — the single-scan replacement for the
  * K separate `contains`/`instr` passes (or K regexes) a naive tagger
  * runs per document. The automaton is built once per JVM from the
  * frozen dictionary (the BpeVocab plan-literal discipline: zero
  * distribution cost, every executor matches identically).
  *
  * Counting semantics: every raw substring occurrence, byte-for-byte.
  * All frozen phrases are BORDERLESS (no proper prefix equals a
  * suffix), so occurrences cannot overlap themselves and the count
  * equals the non-overlapping greedy count a SQL
  * `(length(text) - length(replace(text, kw, ''))) / length(kw)`
  * oracle computes — that equivalence is what makes t21 fully
  * hash-checkable against DuckDB.
  */
object KeywordDict {
  /** Frozen tag dictionary (emitted in this order). Every phrase is
    * borderless — see the counting-semantics note above. */
  val patterns: Array[String] = Array(
    "batch window", "big table", "fast merge", "group value",
    "hash join", "key agg", "row scan", "scan table",
    "slow query", "sort column", "spark order", "stream window")
}

/** The compiled automaton: goto/fail/output tables over dense node
  * ids. Output sets are merged through suffix links at build time, so
  * the match loop only touches each node's precomputed pattern-id
  * list. Built per dictionary; thread-safe after construction. */
final class AhoCorasick(val patterns: Array[String]) {
  import scala.collection.mutable

  private val gotoMaps = mutable.ArrayBuffer(new java.util.HashMap[Character, Integer]())
  private val outBufs = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])

  // trie construction
  {
    var p = 0
    while (p < patterns.length) {
      var node = 0
      val pat = patterns(p)
      var i = 0
      while (i < pat.length) {
        val c = Character.valueOf(pat.charAt(i))
        var next = gotoMaps(node).get(c)
        if (next == null) {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          outBufs += mutable.ArrayBuffer.empty[Int]
          next = Integer.valueOf(gotoMaps.size - 1)
          gotoMaps(node).put(c, next)
        }
        node = next.intValue()
        i += 1
      }
      outBufs(node) += p
      p += 1
    }
  }

  private val fail = new Array[Int](gotoMaps.size)

  // BFS failure links + output-set merge (out(n) ++= out(fail(n)))
  {
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach((_, v) => { fail(v.intValue()) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outBufs(u) ++= outBufs(fail(u))
      gotoMaps(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).containsKey(c)) f = fail(f)
        val t = gotoMaps(f).get(c)
        fail(v.intValue()) =
          if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
        queue.add(v)
      }
    }
  }

  private val out: Array[Array[Int]] = outBufs.map(_.toArray).toArray
  private val gotos: Array[java.util.HashMap[Character, Integer]] = gotoMaps.toArray

  /** Per-pattern occurrence counts of one text, dictionary order. */
  def countsOf(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = Character.valueOf(text.charAt(i))
      while (node != 0 && !gotos(node).containsKey(c)) node = fail(node)
      val next = gotos(node).get(c)
      node = if (next != null) next.intValue() else 0
      val hits = out(node)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}

/** Static forwarder shared by interpreted eval and generated code. */
object KeywordMatchUtil {
  lazy val frozen = new AhoCorasick(KeywordDict.patterns)

  private val kwUtf8: Array[UTF8String] =
    KeywordDict.patterns.map(UTF8String.fromString)

  /** Matched (kw, hits) structs of one text against the frozen
    * dictionary, dictionary order, hits > 0 only. */
  def matchCounts(s: UTF8String): ArrayData = {
    val counts = frozen.countsOf(s.toString)
    var n = 0
    var i = 0
    while (i < counts.length) { if (counts(i) > 0) n += 1; i += 1 }
    val rows = new Array[Any](n)
    var j = 0
    i = 0
    while (i < counts.length) {
      if (counts(i) > 0) {
        rows(j) = new GenericInternalRow(Array[Any](kwUtf8(i), counts(i)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** Catalyst wrapper: `graft_keyword_matches(text)` →
  * array<struct<kw: string, hits: bigint>> (matched dictionary
  * phrases only, dictionary order). */
case class KeywordMatches(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("kw", StringType, nullable = false),
    StructField("hits", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_keyword_matches"

  override protected def nullSafeEval(input: Any): Any =
    KeywordMatchUtil.matchCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.KeywordMatchUtil.matchCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KeywordMatchExpr {
  def keywordMatches(c: Column): Column =
    ExpressionUtils.column(KeywordMatches(ExpressionUtils.expression(c)))
}
