package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BpeTokensExpr, BpeUtil, BpeVocab}

/** Contract for the trained-BPE tokenizer (row 70). Greedy merge
  * application has no SQL analog, so these assertions ARE the
  * correctness gate: agreement with an independent reference encoder
  * on every corpus document, losslessness, and determinism.
  */
class BpeSpec extends GraftSpec {

  /** Independent reference BPE encoder: straightforward immutable-list
    * implementation of the same published algorithm, sharing only the
    * merge table with the kernel under test. */
  private val refRanks: Map[(String, String), Int] =
    BpeVocab.merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  private def refEncodeWord(w: String): List[String] = {
    if (w.isEmpty) return Nil
    val cps = w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp)))
    var units = cps.init :+ (cps.last + "</w>")
    var done = false
    while (!done && units.length > 1) {
      val candidates = units.zip(units.tail).flatMap(p => refRanks.get(p).map(p -> _))
      if (candidates.isEmpty) done = true
      else {
        val (a, b) = candidates.minBy(_._2)._1
        val out = scala.collection.mutable.ListBuffer[String]()
        var rest = units
        while (rest.nonEmpty) rest match {
          case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
          case x :: tl => out += x; rest = tl
          case Nil =>
        }
        units = out.toList
      }
    }
    units
  }

  private def refEncode(text: String): List[String] =
    text.split(" ", -1).toList.flatMap(refEncodeWord)

  test("kernel agrees with the reference encoder on every corpus document") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    val kernel = Tables.documents(spark, sf)
      .select(col("doc_id"), BpeTokensExpr.bpeTokens(col("text")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    docs.foreach { r =>
      val expect = refEncode(r.getString(1))
      assert(kernel(r.getLong(0)) == expect,
        s"doc ${r.getLong(0)}: kernel=${kernel(r.getLong(0)).take(8)} ref=${expect.take(8)}")
    }
  }

  test("tokenization is lossless: units concatenate back to each word + </w>") {
    Tables.documents(spark, sf).select("text").collect().foreach { r =>
      r.getString(0).split(" ", -1).filter(_.nonEmpty).foreach { w =>
        val joined = BpeUtil.encodeWord(w).mkString
        assert(joined == w + "</w>", s"word '$w' round-tripped to '$joined'")
      }
    }
  }

  test("edge cases: empty text, lone/double spaces, unseen unicode word") {
    assert(BpeUtil.encodeWord("").isEmpty)
    assert(refEncode("") == Nil)
    assert(refEncode("  ") == Nil) // doubled space → empty words → nothing
    // unseen script falls back to one unit per codepoint (+ </w> tail)
    val units = BpeUtil.encodeWord("日本語")
    assert(units.toList == List("日", "本", "語</w>"))
  }

  test("t11 BPE packing conserves tokens and keeps shard bins contiguous") {
    val bins = TextAnalysis.t11BpePacking(spark, sf).collect()
    // token conservation: bin totals must equal the independently
    // computed BPE token count of every chunk
    val binTotal = bins.map(_.getAs[Long]("n_tokens")).sum
    val docs = Tables.documents(spark, sf).select("text").collect()
    val expectTotal = docs.map { r =>
      val t = r.getString(0).split(" ", -1)
      val nChunks = math.ceil(t.length / TextAnalysis.ChunkStride.toDouble).toInt
      (0 until nChunks).map { i =>
        val chunk = t.slice(i * TextAnalysis.ChunkStride,
          i * TextAnalysis.ChunkStride + TextAnalysis.ChunkLen)
        refEncode(chunk.mkString(" ")).size.toLong
      }.sum
    }.sum
    assert(binTotal == expectTotal, s"bin total $binTotal != chunk total $expectTotal")
    // bins within a shard are contiguous from 0 (greedy running sum)
    bins.groupBy(_.getAs[Long]("shard")).values.foreach { rs =>
      val ids = rs.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0L && ids.sameElements(ids.head to ids.last))
    }
  }

  test("the packing API is one implementation: t11's path with whitespace cost IS t9") {
    import org.apache.spark.sql.functions._
    val viaApi = TextAnalysis.packByCost(
      TextAnalysis.chunkStream(spark, sf), size(col("chunk")))
      .collect().map(_.toString).toSeq
    val t9 = TextAnalysis.t9SequencePacking(spark, sf)
      .collect().map(_.toString).toSeq
    assert(viaApi == t9,
      "packByCost(whitespace) must reproduce t9 bin-for-bin")
  }

  test("t18: in-engine training to convergence byte-matches the frozen merge table") {
    // The frozen BpeVocab.merges array was trained OFFLINE by the
    // public Sennrich algorithm on the sf0.01 documents corpus; the
    // distributed trainer must reproduce it exactly — every merge,
    // in order — which also keeps every t10 encoder spec binding
    // against the trained (not just committed) table.
    val trained = TextAnalysis.trainBpeMerges(
      Tables.documents(spark, "/root/testdata/sf0.01"), Int.MaxValue)
    assert(trained == BpeVocab.merges.toSeq,
      s"trained ${trained.length} merges vs frozen ${BpeVocab.merges.length}; " +
        s"first diff at ${trained.zip(BpeVocab.merges).indexWhere(p => p._1 != p._2)}")
  }

  test("t18 queries entry emits the first BenchTrainMerges merges in order") {
    val rows = TextAnalysis.t18BpeTrain(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == TextAnalysis.BenchTrainMerges)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i)
      assert((r.getString(1), r.getString(2)) == BpeVocab.merges(i))
    }
  }

  test("t10 is deterministic and counts match unit arrays") {
    val a = TextAnalysis.t10BpeTokens(spark, sf).collect()
    val b = TextAnalysis.t10BpeTokens(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    // spot-check: bpe_tokens of a known merged word
    val n = spark.sql("SELECT size(graft_bpe_tokens('stream stream xyz')) AS n")
      .head.getInt(0)
    // 'stream' is a trained single token; 'xyz' has no merges → 3 units
    assert(n == 1 + 1 + 3, s"got $n")
  }
}
