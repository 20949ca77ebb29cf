package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution (SURVEY §2 row 165): blocked fuzzy matching over
  * the part-name catalog — the "same real-world thing, different
  * string" problem (catalog dedup, vendor-name conciliation) that
  * exact dedup (d1/r6) cannot see and full-corpus pairwise comparison
  * cannot afford.
  *
  * Scale shape (the Fellegi-Sunter blocking discipline): matching runs
  * on the DISTINCT-name table, never the row table — the name catalog
  * is vocabulary-bounded (t16's DF-table argument), and the quadratic
  * candidate step is confined to blocks (shared head token) the way
  * d2 confines Jaccard to shared shingles. The edit-distance kernel is
  * Spark's built-in codegen'd `levenshtein`, and a length-difference
  * bound rides the join condition so candidates that cannot pass the
  * threshold are dropped before the kernel runs.
  */
object EntityResolution {

  val MaxEditDistance = 2

  /** The distinct-name catalog with row support: one row per name,
    * carrying how many part rows share it and the canonical (min)
    * part key. Vocabulary-bounded — this is the frame ER runs on. */
  private[graft] def nameCatalog(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("canon_key"))
      .withColumn("block", element_at(split(col("p_name"), " "), -1))

  /** er1: blocked fuzzy name matching — candidate pairs share a block
    * (last name token), survive a length-difference prune, and match
    * iff levenshtein ≤ [[MaxEditDistance]]. Output is the match-pair
    * ledger an ER pipeline feeds to clustering (d6's connected
    * components slot in directly on (name_a, name_b) edges). */
  def er1FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val names = nameCatalog(s, dir)
    val a = names.select(col("p_name").as("name_a"), col("block"),
      col("n_parts").as("n_parts_a"))
    val b = names.select(col("p_name").as("name_b"), col("block"),
      col("n_parts").as("n_parts_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <=
        MaxEditDistance)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= MaxEditDistance)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_parts_a"), col("n_parts_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  val oracles: Map[String, String] = Map(
    "er1_fuzzy_match" ->
      s"""WITH names AS (SELECT p_name, count(*) AS n_parts,
         |    split_part(p_name, ' ', -1) AS block
         |  FROM part GROUP BY 1, 3)
         |SELECT a.p_name AS name_a, b.p_name AS name_b,
         |  levenshtein(a.p_name, b.p_name) AS dist,
         |  a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
         |FROM names a JOIN names b ON a.block = b.block
         |  AND a.p_name < b.p_name
         |  AND abs(length(a.p_name) - length(b.p_name)) <= $MaxEditDistance
         |WHERE levenshtein(a.p_name, b.p_name) <= $MaxEditDistance
         |ORDER BY 1, 2""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er1_fuzzy_match" -> (er1FuzzyMatch _))
}
