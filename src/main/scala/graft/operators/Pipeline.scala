package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed end-to-end pipelines (SURVEY §2 row 65): the operators
  * are a library, and a real training-data-prep job chains them. This
  * is the "switch from the reference" proof — one declarative plan
  * from raw documents to a cleaned corpus, with every stage still
  * optimizable by Catalyst (the joins below are plain equi-joins on
  * doc_id, so the whole chain is a handful of hash joins over one
  * scan lineage, not three separate jobs).
  */
object Pipeline {

  /** pipe1: exact-dedup → quality floor → predicted-English only.
    * Emits the surviving corpus with its scores. */
  def pipe1DataPrep(s: SparkSession, dir: String): DataFrame = {
    val keep = Dedup.d1DedupExact(s, dir).select(col("keep_id").as("doc_id"))
    val lang = TextAnalysis.t1LangId(s, dir)
      .filter(col("pred_lang") === "en")
      .select(col("doc_id"))
    val quality = TextAnalysis.t2QualityScore(s, dir)
      .filter(col("quality") >= 0.5)
      .select(col("doc_id"), col("quality"), col("n_tokens"))
    quality
      .join(keep, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(
    "pipe1_data_prep" -> {
      val en = TextAnalysis.stoplists("en").map(w => s"'$w'").mkString("[", ",", "]")
      val es = TextAnalysis.stoplists("es").map(w => s"'$w'").mkString("[", ",", "]")
      val de = TextAnalysis.stoplists("de").map(w => s"'$w'").mkString("[", ",", "]")
      val fr = TextAnalysis.stoplists("fr").map(w => s"'$w'").mkString("[", ",", "]")
      def cnt(arr: String) =
        s"len(list_filter(string_split(text, ' '), x -> list_contains($arr, x)))"
      s"""WITH scored AS (SELECT doc_id,
         |    ${cnt(en)} AS s_en, ${cnt(es)} AS s_es,
         |    ${cnt(de)} AS s_de, ${cnt(fr)} AS s_fr
         |  FROM documents),
         |lang AS (SELECT doc_id FROM scored
         |  WHERE NOT (s_en + s_es + s_de + s_fr = 0)
         |    AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr),
         |quality AS (SELECT doc_id,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    round(0.4 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
         |      + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |          / greatest(length(text), 1))
         |      + 0.3 * (CAST(${cnt(en)} AS DOUBLE)
         |          / greatest(len(string_split(text, ' ')), 1)), 6) AS quality
         |  FROM documents),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         |SELECT q.doc_id, q.quality, q.n_tokens
         |FROM quality q
         |JOIN keep k ON k.doc_id = q.doc_id
         |JOIN lang l ON l.doc_id = q.doc_id
         |WHERE q.quality >= 0.5
         |ORDER BY q.doc_id""".stripMargin
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe1_data_prep" -> (pipe1DataPrep _))
}
