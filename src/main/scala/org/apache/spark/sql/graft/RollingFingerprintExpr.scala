package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled winnowing fingerprinter shared by eval and codegen. */
object RollingFingerprintUtil {
  private val Base = 1000003L

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03): polynomial rolling hash over character k-grams, then
    * the minimum hash of each sliding window of w consecutive k-grams,
    * deduplicated by selection position. Guarantees: any substring
    * match of length ≥ w+k-1 between two documents yields at least one
    * shared fingerprint. */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length - k + 1
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var pow = 1L
    var h = 0L
    var i = 0
    while (i < k) {
      h = h * Base + str.charAt(i)
      if (i < k - 1) pow *= Base
      i += 1
    }
    hs(0) = h
    i = 1
    while (i < n) {
      h = (h - str.charAt(i - 1) * pow) * Base + str.charAt(i + k - 1)
      hs(i) = h
      i += 1
    }
    val windows = n - w + 1
    if (windows < 1) {
      // text shorter than one full window: emit the single global min
      var m = hs(0); i = 1
      while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
      return new GenericArrayData(Array[Any](m))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastPos = -1
    var j = 0
    while (j < windows) {
      // rightmost minimum of hs[j .. j+w-1] (standard winnowing tie rule)
      var pos = j
      var m = hs(j)
      var t = j + 1
      while (t < j + w) {
        if (hs(t) <= m) { m = hs(t); pos = t }
        t += 1
      }
      if (pos != lastPos) { out += m; lastPos = pos }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Winnowing rolling-hash fingerprints of a string column as
  * `array<long>` — the locality-preserving document fingerprint
  * (shared substrings ⇒ shared fingerprints) that backs plagiarism/
  * near-dup detection at corpus scale. One compiled call per row via
  * codegen, same pattern as [[WordNgrams]].
  */
case class RollingFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 2 && w >= 1, s"need k>=2, w>=1; got k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprintUtil.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RollingFingerprintUtil.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprintExpr {
  def fingerprints(c: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(RollingFingerprint(ExpressionUtils.expression(c), k, w))
}
