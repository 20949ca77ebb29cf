package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{BpeTokens, DistinctWordNgrams, DotProduct, MinHash32, NgramFreqs, QuantizeI8, RepetitionStats, RollingFingerprint, SimHash64, TermFreqs, WordNgrams}

/** `SparkSessionExtensions` hook registering graft's native Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen'd kernels as the DataFrame API:
  *
  * {{{
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * Installed automatically by [[GraftSession]] via
  * `spark.sql.extensions`; any externally-built session can add it the
  * same way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_dot expects exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2 && children(1).foldable,
          "graft_word_ngrams expects (text, constant n)")
        val n = children(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_word_ngrams: n must be an integer literal, got $other")
        }
        WordNgrams(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprints"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_fingerprints"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3 && children(1).foldable && children(2).foldable,
          "graft_fingerprints expects (text, constant k, constant w)")
        def toInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
          e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_fingerprints: expected integer literal, got $other")
          }
        RollingFingerprint(children.head, toInt(children(1)), toInt(children(2)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_quantize_i8"),
      new ExpressionInfo(classOf[QuantizeI8].getName, "graft_quantize_i8"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_quantize_i8 expects exactly 1 argument")
        QuantizeI8(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_simhash64 expects exactly 1 argument")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash32"),
      new ExpressionInfo(classOf[MinHash32].getName, "graft_minhash32"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_minhash32 expects exactly 1 argument")
        MinHash32(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_tokens"),
      new ExpressionInfo(classOf[BpeTokens].getName, "graft_bpe_tokens"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_bpe_tokens expects exactly 1 argument")
        BpeTokens(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_distinct_ngrams"),
      new ExpressionInfo(classOf[DistinctWordNgrams].getName, "graft_distinct_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          "graft_distinct_ngrams expects (text, constant n)")
        children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
            DistinctWordNgrams(children.head, n)
          case other => throw new IllegalArgumentException(
            s"graft_distinct_ngrams: n must be an integer literal, got $other")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_term_freqs"),
      new ExpressionInfo(classOf[TermFreqs].getName, "graft_term_freqs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_term_freqs expects exactly 1 argument")
        TermFreqs(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngram_freqs"),
      new ExpressionInfo(classOf[NgramFreqs].getName, "graft_ngram_freqs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          "graft_ngram_freqs expects (text, constant n)")
        children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
            NgramFreqs(children.head, n)
          case other => throw new IllegalArgumentException(
            s"graft_ngram_freqs: n must be an integer literal, got $other")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_repetition"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "graft_repetition"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_repetition expects exactly 1 argument")
        RepetitionStats(children.head)
      }))
  }
}
