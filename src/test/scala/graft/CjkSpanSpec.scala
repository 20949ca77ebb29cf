package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** r14 ask #4: the span plane (d18–d23, t31/t32) used to tokenize on
  * whitespace only, so an UNSEGMENTED document (CJK/Thai/unspaced
  * scripts — a large fraction of any 100 TB web corpus) was ONE token
  * and span dedup/decontamination silently no-op'd on it. These
  * planted fixtures prove the codepoint fallback ([[Dedup.spanTokens]])
  * makes repeated CJK spans first-class citizens of the whole plane:
  * detection, extents, scrubbing, and eval decontamination.
  */
class CjkSpanSpec extends GraftSpec {

  private val K = Dedup.ExactSpanTokens

  // a 30-codepoint CJK phrase (> K = 20) planted in two unspaced docs
  private val cjkSpan = "訓練資料集需要跨文件重複片段檢測否則模型記憶污染評估基準失效"
  assert(cjkSpan.length > K, "fixture span must exceed the gram length")
  private def cjkDoc(prefix: String, suffix: String) = prefix + cjkSpan + suffix

  test("spanTokens: unsegmented text falls back to codepoint tokens; spaced text keeps word grain") {
    import spark.implicits._
    val got = Seq(
      ("你好世界", 1), ("hello world two", 2), ("", 3))
      .toDF("text", "id")
      .select(col("id"), Dedup.spanTokens(col("text")).as("t"),
        Dedup.spanSegmented(col("text")).as("seg"))
      .collect().map(r => r.getInt(0) ->
        (r.getSeq[String](1), r.getBoolean(2))).toMap
    assert(got(1)._1 == Seq("你", "好", "世", "界") && !got(1)._2,
      s"CJK must tokenize per codepoint: ${got(1)}")
    assert(got(2)._1 == Seq("hello", "world", "two") && got(2)._2)
    assert(got(3)._1.isEmpty, "empty text has no tokens")
    // the rule matches the DuckDB fragment the oracles inline
    assert(Dedup.SpanTokensSql.contains("regexp_extract_all(text, '(?s).')"))
    assert(Dedup.SpanTokensSql.contains("string_split(text, ' ')"))
  }

  test("d18 core: a repeated CJK span across two unspaced docs is caught and masked keep-one-first") {
    import spark.implicits._
    val docs = Seq(
      (1L, cjkDoc("甲乙丙丁戊己庚辛壬癸", "之後還有其他獨立內容繼續延伸")),
      (2L, cjkDoc("完全不同的開頭文字在此", "结尾也不一样的字符串内容")),
      (3L, "an ordinary spaced english document long enough to be " +
        "profiled but sharing no span with anything else at all " +
        "because every word here is unique enough"))
      .toDF("doc_id", "text")
    val prof = Dedup.exactSpanMask(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // both CJK docs enter the plane at codepoint grain
    assert(prof.contains(1L) && prof.contains(2L),
      s"unspaced docs must not be filtered out: ${prof.keySet}")
    // the shared span is ≥ K codepoints ⇒ duplicated grams in BOTH
    assert(prof(1L).getLong(prof(1L).fieldIndex("n_dup_windows")) > 0)
    assert(prof(2L).getLong(prof(2L).fieldIndex("n_dup_windows")) > 0)
    // keep-one-first: doc 1 (first occurrence) keeps its tokens,
    // doc 2's copy is masked with the exact covered-token count
    assert(prof(1L).getLong(prof(1L).fieldIndex("n_masked_tokens")) == 0L)
    assert(prof(2L).getLong(prof(2L).fieldIndex("n_masked_tokens")) ==
      cjkSpan.length.toLong,
      s"doc 2 must mask exactly the ${cjkSpan.length}-codepoint span: ${prof(2L)}")
  }

  test("d21 scrub: the CJK copy is excised and reassembled WITHOUT injected spaces") {
    import spark.implicits._
    val pre = "完全不同的開頭文字在此"
    val post = "结尾也不一样的字符串内容"
    val docs = Seq(
      (1L, cjkDoc("甲乙丙丁戊己庚辛壬癸", "之後還有其他獨立內容繼續延伸")),
      (2L, cjkDoc(pre, post)))
      .toDF("doc_id", "text")
    val extents = Dedup.spanIslands(Dedup.exactSpanMaskedStarts(docs))
    val got = Dedup.d21Scrub(docs, extents)
      .select(col("doc_id"), col("n_tokens_removed"),
        Dedup.scrubbedTextCol.as("scrubbed"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // first occurrence byte-unchanged
    assert(got(1L).getString(2) == cjkDoc("甲乙丙丁戊己庚辛壬癸", "之後還有其他獨立內容繼續延伸"))
    // the copy: span excised, splice clean, NO space separators
    assert(got(2L).getLong(1) == cjkSpan.length.toLong)
    assert(got(2L).getString(2) == pre + post,
      s"scrub must rejoin codepoints without spaces: '${got(2L).getString(2)}'")
    assert(!got(2L).getString(2).contains(" "))
  }

  test("t31/t32: CJK eval contamination is detected and scrubbed from the train side") {
    import spark.implicits._
    val mod = TextAnalysis.EvalHoldoutMod
    // doc_id % mod == 0 ⇒ eval; plant the eval span inside a train doc
    val docs = Seq(
      (mod.toLong, cjkDoc("評估基準文件的獨特前綴", "評估側其餘部分不同")), // eval
      (7L, cjkDoc("訓練文件洩漏了評估片段", "訓練側其餘內容延續")), // train, contaminated
      (9L, "a clean spaced training document with absolutely no overlap " +
        "whatsoever against the evaluation holdout side of this corpus"))
      .toDF("doc_id", "text")
    val contam = TextAnalysis.spanDecontaminate(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(contam.contains(7L), "the CJK-contaminated train doc must be flagged")
    assert(!contam.contains(9L))
    val r7 = contam(7L)
    assert(r7.getLong(r7.fieldIndex("n_contam_tokens")) == cjkSpan.length.toLong)
    assert(r7.getLong(r7.fieldIndex("n_eval_docs")) == 1L)
    // and the scrub removes exactly that span, rejoining without spaces
    val scrubbed = TextAnalysis.decontScrub(docs)
      .select(col("doc_id"), col("n_tokens_removed"),
        Dedup.scrubbedTextCol.as("stext"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!scrubbed.contains(mod.toLong), "eval docs are holdout, not output")
    assert(scrubbed(7L).getLong(1) == cjkSpan.length.toLong)
    assert(scrubbed(7L).getString(2) == "訓練文件洩漏了評估片段" + "訓練側其餘內容延續")
    assert(scrubbed(9L).getLong(1) == 0L)
  }
}
