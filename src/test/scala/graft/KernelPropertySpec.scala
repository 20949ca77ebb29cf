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

  test("NgramFreqs equals the WordNgrams multiset, first-occurrence ordered") {
    check(Prop.forAll(text, Gen.choose(1, 4)) { (t: String, n: Int) =>
      val row = org.apache.spark.sql.graft.NgramFreqsUtil
        .ngramFreqs(UTF8String.fromString(t), n)
      val got = (0 until row.numElements()).map { i =>
        val st = row.getStruct(i, 2)
        st.getUTF8String(0).toString -> st.getLong(1)
      }
      val grams = t.split(" ", -1).sliding(n)
        .filter(_.length == n).map(_.mkString(" ")).toSeq
      val want = grams.distinct.map(g => g -> grams.count(_ == g).toLong)
      got == want
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

  private def quantize(v: Array[Double]): (Double, Array[Byte], Long, Int, Int, Double) = {
    val out = org.apache.spark.sql.graft.QuantizeI8.quantizeJava(
      new GenericArrayData(v))
    (out(0).asInstanceOf[Double],
      out(1).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toByteArray(),
      out(2).asInstanceOf[java.lang.Long].longValue(),
      out(3).asInstanceOf[java.lang.Integer].intValue(),
      out(4).asInstanceOf[java.lang.Integer].intValue(),
      out(5).asInstanceOf[java.lang.Double].doubleValue())
  }

  test("QuantizeI8 codes match a BigDecimal HALF_UP reference; digests are consistent") {
    val vec = Gen.listOf(Gen.choose(-100.0, 100.0)).map(_.take(32))
    check(Prop.forAll(vec) { (v: List[Double]) =>
      val (scale, q, sumQ, minQ, maxQ, err) = quantize(v.toArray)
      val wantScale = if (v.isEmpty) 0.0 else v.map(math.abs).max
      // independent rounding reference: BigDecimal HALF_UP is
      // half-away-from-zero on the exact decimal value
      val wantQ = v.map { x =>
        if (wantScale == 0.0) 0
        else new java.math.BigDecimal(x * 127.0 / wantScale)
          .setScale(0, java.math.RoundingMode.HALF_UP).intValueExact()
      }
      var errSq = 0.0
      v.zip(wantQ).foreach { case (x, qi) =>
        val d = x - (if (wantScale == 0.0) 0.0 else qi * wantScale / 127.0)
        errSq += d * d
      }
      scale == wantScale &&
        q.toSeq == wantQ.map(_.toByte) &&
        sumQ == wantQ.map(_.toLong).sum &&
        minQ == (if (v.isEmpty) 0 else wantQ.min) &&
        maxQ == (if (v.isEmpty) 0 else wantQ.max) &&
        err == math.sqrt(errSq) &&
        wantQ.forall(qi => qi >= -127 && qi <= 127)
    })
  }

  test("QuantizeI8 handles empty and all-zero vectors") {
    val (s0, q0, sum0, min0, max0, e0) = quantize(Array.empty[Double])
    assert(s0 == 0.0 && q0.isEmpty && sum0 == 0L && min0 == 0 && max0 == 0 && e0 == 0.0)
    val (s1, q1, sum1, min1, max1, e1) = quantize(Array(0.0, 0.0, 0.0))
    assert(s1 == 0.0 && q1.toSeq == Seq[Byte](0, 0, 0) &&
      sum1 == 0L && min1 == 0 && max1 == 0 && e1 == 0.0)
  }

  test("QuantizeI8 interpreted eval equals the shared kernel output") {
    val vec = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
    check(Prop.forAll(vec) { (v: List[Double]) =>
      val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
        new GenericArrayData(v.toArray), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))
      val row = org.apache.spark.sql.graft.QuantizeI8(lit).eval(null)
        .asInstanceOf[InternalRow]
      val (scale, q, sumQ, minQ, maxQ, err) = quantize(v.toArray)
      row.getDouble(0) == scale &&
        row.getArray(1).toByteArray().toSeq == q.toSeq &&
        row.getLong(2) == sumQ && row.getInt(3) == minQ &&
        row.getInt(4) == maxQ && row.getDouble(5) == err
    })
  }

  test("DotI8 eval equals a BigInt reference exactly, including extreme codes") {
    val codes = Gen.listOfN(64, Gen.chooseNum(-127, 127).map(_.toByte))
    check(Prop.forAll(codes, codes) { (a: List[Byte], b: List[Byte]) =>
      val lit = org.apache.spark.sql.catalyst.expressions.Literal
      val tpe = org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType)
      val got = org.apache.spark.sql.graft.DotI8(
        lit.create(new GenericArrayData(a.toArray), tpe),
        lit.create(new GenericArrayData(b.toArray), tpe)).eval(null)
        .asInstanceOf[Long]
      val want = a.zip(b).map { case (x, y) => BigInt(x.toInt) * BigInt(y.toInt) }.sum
      BigInt(got) == want
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

  test("AhoCorasick counts ALL occurrences, including overlapping ones") {
    val ac = new org.apache.spark.sql.graft.AhoCorasick(Array("aba", "ba", "zz"))
    // "ababa": aba at 0 and 2 (overlapping), ba at 1 and 3, zz absent
    assert(ac.countsOf("ababa").toSeq == Seq(2L, 2L, 0L))
    assert(ac.countsOf("").toSeq == Seq(0L, 0L, 0L))
    // patterns that are substrings of each other both fire
    val ac2 = new org.apache.spark.sql.graft.AhoCorasick(Array("scan", "can"))
    assert(ac2.countsOf("scan can").toSeq == Seq(1L, 2L))
  }

  test("frozen keyword dictionary is borderless, so AC count == greedy count") {
    // the t21 oracle counts non-overlapping occurrences via replace();
    // a borderless pattern cannot overlap itself, so both counts agree
    for (p <- org.apache.spark.sql.graft.KeywordDict.patterns;
         b <- 1 until p.length)
      assert(p.substring(0, b) != p.substring(p.length - b),
        s"'$p' has a border of length $b")
  }

  test("KeywordMatchUtil equals a per-keyword indexOf scan over corpus docs") {
    val docs = graft.GraftTestSpark.spark.read
      .parquet(s"${graft.GraftTestSpark.sf}/documents.parquet")
      .select("text").collect().map(_.getString(0))
    def naive(text: String, kw: String): Long = {
      var n = 0L; var i = text.indexOf(kw)
      while (i >= 0) { n += 1; i = text.indexOf(kw, i + 1) } // all occurrences
      n
    }
    var hits = 0L
    docs.foreach { t =>
      val got = org.apache.spark.sql.graft.KeywordMatchUtil.frozen.countsOf(t)
      org.apache.spark.sql.graft.KeywordDict.patterns.zipWithIndex.foreach {
        case (kw, i) =>
          assert(got(i) == naive(t, kw), s"kw '$kw' in doc of len ${t.length}")
      }
      hits += got.sum
    }
    assert(hits > 0, "fixture must exercise at least one match")
  }

  test("BootWeights md5 uniform matches the hex-string reference and stays in (0,1)") {
    // reference takes the HEX-PARSE route (exactly what the SQL form
    // conv(substring(md5(s),1,8),16,10) computes), so the kernel's
    // big-endian byte assembly is checked against the semantics the
    // DuckDB oracle evaluates
    def ref(eventId: Long, b: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"boot:$b:$eventId".getBytes("US-ASCII"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967296.0
    }
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(0, 500)) { (id: Long, b: Int) =>
      val u = org.apache.spark.sql.graft.BootWeightsUtil.uniform(id, b)
      u == ref(id, b) && u > 0.0 && u <= 1.0
    })
  }

  test("BootWeightPair: weights ladder the CDF, value leg is exactly w*v, shape 2B") {
    val cdf = org.apache.spark.sql.graft.BootWeightsUtil.PoissonCdf
    check(Prop.forAll(Gen.choose(-100000L, 100000L),
      Gen.choose(1, 64), Gen.choose(-1e6, 1e6)) { (id: Long, b: Int, v: Double) =>
      val arr = org.apache.spark.sql.graft.BootWeightsUtil
        .bootWeightPair(id, v, b).toDoubleArray()
      arr.length == 2 * b && (0 until b).forall { i =>
        val u = org.apache.spark.sql.graft.BootWeightsUtil.uniform(id, i)
        val w = cdf.count(u >= _).toDouble
        arr(i) == w && arr(b + i) == w * v && w >= 0.0 && w <= 6.0
      }
    })
  }

  test("SearchSortedD equals the strict-less count on sorted arrays with duplicates") {
    val arrGen = Gen.listOf(Gen.choose(-100, 100).map(_ / 10.0)).map(_.sorted)
    check(Prop.forAll(arrGen, Gen.choose(-110, 110).map(_ / 10.0)) {
      (cuts: List[Double], v: Double) =>
        val expr = org.apache.spark.sql.graft.SearchSortedD(
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            new GenericArrayData(cuts.toArray),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)),
          org.apache.spark.sql.catalyst.expressions.Literal(v))
        val got = expr.eval(InternalRow.empty).asInstanceOf[Int]
        // the HOF form it replaces: size(filter(cuts, c -> v > c)) —
        // on a sorted array the lower bound IS the strict-less count,
        // so swapping forms cannot move a row's bucket
        got == cuts.count(v > _)
    })
  }

  test("SearchSortedD probe at/between/outside every cut of a duplicated ladder") {
    // deterministic edges the generator may miss: probe exactly ON a
    // duplicated cut, between cuts, below all, above all
    val cuts = Array(1.0, 2.0, 2.0, 2.0, 3.0, 5.0)
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      new GenericArrayData(cuts),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
    def at(v: Double): Int = org.apache.spark.sql.graft.SearchSortedD(
      lit, org.apache.spark.sql.catalyst.expressions.Literal(v))
      .eval(InternalRow.empty).asInstanceOf[Int]
    assert(at(0.5) == 0 && at(1.0) == 0 && at(1.5) == 1)
    assert(at(2.0) == 1 && at(2.5) == 4 && at(3.0) == 4)
    assert(at(4.0) == 5 && at(5.0) == 5 && at(9.0) == 6)
  }
}
