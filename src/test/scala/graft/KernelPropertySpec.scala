package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{RollingFingerprintUtil, WordNgramsUtil}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests for the custom Catalyst kernels — these are
  * the only hand-written compute loops in the engine, so they get the
  * heaviest correctness scrutiny. Pure JVM (no SparkSession): the
  * utils are exactly what generated code calls.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.nonEmptyStringOf(Gen.alphaLowerChar).map(_.take(12))
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("WordNgrams matches the naive sliding-window reference") {
    check(Prop.forAll(text, Gen.choose(1, 5)) { (t: String, n: Int) =>
      val got = WordNgramsUtil.wordNgrams(UTF8String.fromString(t), n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
      val want = t.split(" ", -1).sliding(n)
        .filter(_.length == n).map(_.mkString(" ")).toArray
      got.sameElements(want)
    })
  }

  test("WordNgrams(n=1) reproduces the token list exactly") {
    check(Prop.forAll(text) { (t: String) =>
      WordNgramsUtil.wordNgrams(UTF8String.fromString(t), 1)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
        .sameElements(t.split(" ", -1))
    })
  }

  private def fingerprintSet(s: String, k: Int, w: Int): Set[Long] =
    RollingFingerprintUtil.fingerprints(UTF8String.fromString(s), k, w)
      .toLongArray().toSet

  test("winnowing guarantee: shared substring >= w+k-1 chars => shared fingerprint") {
    val k = 8; val w = 4
    val chunk = Gen.nonEmptyStringOf(Gen.alphaChar).map(_.take(30))
    val sharedGen = Gen.nonEmptyStringOf(Gen.alphaNumChar)
      .map(_.take(40).padTo(k + w - 1, 'x').mkString)
    check(Prop.forAll(chunk, chunk, sharedGen) {
      (pre: String, post: String, shared: String) =>
        fingerprintSet(s"$pre$shared", k, w)
          .intersect(fingerprintSet(s"$shared$post", k, w)).nonEmpty
    })
  }

  test("winnowing fingerprints are deterministic") {
    check(Prop.forAll(text) { (t: String) =>
      fingerprintSet(t, 8, 4) == fingerprintSet(t, 8, 4)
    })
  }

  test("VectorSumAgg update/merge equals the per-dimension reference sum") {
    val vecs = Gen.listOf(Gen.listOfN(8, Gen.choose(-10.0, 10.0)))
    check(Prop.forAll(vecs) { (vs: List[List[Double]]) =>
      val agg = org.apache.spark.sql.graft.VectorSumAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = true))
      // split input across two "partitions", update each, then merge
      val (l, r) = vs.splitAt(vs.length / 2)
      def fold(part: List[List[Double]]) = part.foldLeft(agg.createAggregationBuffer()) {
        (buf, v) => agg.update(buf, InternalRow(new GenericArrayData(v.toArray)))
      }
      val merged = agg.merge(fold(l), fold(r))
      // reference: elementwise sum, ragged vectors padded (the agg's
      // documented semantics: the buffer grows to the longest vector)
      val maxLen = if (vs.isEmpty) 0 else vs.map(_.length).max
      val want = Array.fill(maxLen)(0.0)
      vs.foreach(_.zipWithIndex.foreach { case (x, i) => want(i) += x })
      // two-partition merge reassociates the float sums => tolerance
      merged.length == want.length && merged.zip(want).forall {
        case (g, w) => math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w))
      }
    })
  }

  test("BpeUtil: random texts tokenize losslessly and deterministically") {
    // beyond the in-vocab corpus: random words exercise the
    // no-merge-applies and partial-merge paths
    val anyWord = Gen.nonEmptyStringOf(
      Gen.frequency(8 -> Gen.alphaLowerChar, 1 -> Gen.numChar,
        1 -> Gen.oneOf('é', 'ß', '中'))).map(_.take(10))
    val anyText = Gen.listOf(anyWord).map(_.mkString(" "))
    check(Prop.forAll(anyText) { (t: String) =>
      val words = t.split(" ", -1).filter(_.nonEmpty)
      val lossless = words.forall { w =>
        org.apache.spark.sql.graft.BpeUtil.encodeWord(w).mkString == w + "</w>"
      }
      val a = org.apache.spark.sql.graft.BpeUtil.tokens(UTF8String.fromString(t))
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
      val b = org.apache.spark.sql.graft.BpeUtil.tokens(UTF8String.fromString(t))
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
      lossless && a.sameElements(b) &&
        a.length == words.map(
          org.apache.spark.sql.graft.BpeUtil.encodeWord(_).length).sum
    })
  }

  test("DotProduct eval matches a sequential reference sum bit-for-bit") {
    val vec = Gen.listOfN(16, Gen.choose(-100.0, 100.0))
    check(Prop.forAll(vec, vec) { (a: List[Double], b: List[Double]) =>
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray)
      val bd = new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray)
      val lit = org.apache.spark.sql.catalyst.expressions.Literal
      val e = org.apache.spark.sql.graft.DotProduct(
        lit.create(ad, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
        lit.create(bd, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
      val got = e.eval(null).asInstanceOf[Double]
      var want = 0.0
      a.zip(b).foreach { case (x, y) => want += x * y }
      got == want
    })
  }
}
