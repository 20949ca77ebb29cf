package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** t19 HTML extraction (row 149) and t20 bigram-LM perplexity
  * (row 150). The synthetic corpus is tag-free, so t19's extraction
  * path is pinned here with planted HTML; t20 is recomputed
  * brute-force on the driver from the raw text.
  */
class LmExtractSpec extends GraftSpec {

  test("t19 extracts text from planted HTML: scripts/styles/comments/tags/entities") {
    import spark.implicits._
    val html = Seq(
      (1L, "<html><head><style>p {color: red}</style><script type=\"text/js\">var x = \"<p>\";</script></head>" +
        "<body><h1>Title  here</h1><!-- note --><p>Para &amp; one &lt;tag&gt; &quot;q&quot; &#39;s&#39; end</p></body></html>"),
      (2L, "plain text no markup"),
      (3L, "a &amp;amp; b")) // double-escaped: must decode exactly one level
      .toDF("doc_id", "text")
    val out = TextAnalysis.htmlExtract(html).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("extracted") ==
      "Title here Para & one <tag> \"q\" 's' end")
    assert(out(1L).getAs[Int]("n_tags") > 10)
    assert(out(2L).getAs[String]("extracted") == "plain text no markup")
    assert(out(2L).getAs[Int]("n_tags") == 0)
    assert(out(3L).getAs[String]("extracted") == "a &amp; b")
  }

  test("t20 perplexity matches a driver-side brute-force recompute") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val words = docs.view.mapValues(_.split(" ", -1).toSeq).toMap
    val c1 = words.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = c1.size
    val c2 = words.values.flatMap(w => w.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = words.collect { case (id, w) if w.length >= 2 =>
      val lps = w.sliding(2).filter(_.length == 2).map { bg =>
        val key = bg.mkString(" ")
        math.log((c2(key) + TextAnalysis.LmAddK) / (c1(bg.head) + TextAnalysis.LmAddK * v))
      }.toSeq
      id -> (-lps.sum / lps.size, lps.size.toLong)
    }
    val got = TextAnalysis.t20BigramPerplexity(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nll, n) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bigrams") == n)
      assert(math.abs(r.getAs[Double]("avg_nll") - nll) < 1e-5)
      assert(math.abs(r.getAs[Double]("ppl") - math.exp(nll)) < 1e-3)
    }
  }

  test("t20 scores a repeated-bigram doc below a novel-bigram doc") {
    // Perplexity filtering's point: text made of corpus-frequent
    // transitions scores low (keep), unusual transitions score high.
    val byDoc = TextAnalysis.t20BigramPerplexity(spark, sf)
      .select("doc_id", "ppl").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byDoc.values.forall(p => p > 1.0 && p.isFinite))
    // corpus-wide spread exists (not a constant score)
    assert(byDoc.values.max > byDoc.values.min)
  }
}
