package graft.operators

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2 rows 29-31).
  *
  * n1 is the exact brute-force baseline: a bounded query set × corpus
  * join (at 100 TB the query side is small and broadcast; the corpus
  * scan is the irreducible cost). n2/n3 are the scale paths: random-
  * hyperplane LSH buckets and IVF cells turn the corpus side into an
  * equi-join, so candidate generation is a shuffle on the bucket key
  * instead of a full cross product.
  */
object Similarity {

  val TopK = 5
  val NumQueries = 10 // query set: vec_id < 10

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", VectorFunctions.l2normNative("v"))

  private def rankTopK(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos_raw"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** n1: exact cosine top-k per query vector (brute force baseline).
    * The query set broadcasts; one pass over the corpus. */
  def n1CosineTopk(s: SparkSession, dir: String): DataFrame = {
    val e = corpus(s, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val pairs = broadcast(q)
      .join(e, col("query_id") =!= col("vec_id"))
      .withColumn("cos_raw", VectorFunctions.cosineFromParts(
        VectorFunctions.dotNative("qv", "v"), col("qn"), col("nrm")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_raw"))
    rankTopK(pairs)
  }

  val LshTables = 8 // independent hash tables (union of candidates)
  val LshBits = 4 // hyperplanes per table → 16 buckets/table

  /** Multi-table random-hyperplane LSH: LshTables independent tables of
    * LshBits sign bits each; a vector lands in one bucket per table and
    * candidate pairs share (table, bucket). Deterministic pseudo-random
    * plane weights: plane p, dim j → xxhash64(p*1024+j) folded into
    * [-0.5, 0.5], computed inline with higher-order functions
    * (codegen'd; no driver-side plane matrix, so the same expression
    * works unchanged on a 1000-executor cluster). Multiple small tables
    * beat one wide code: recall compounds as 1-(1-p^b)^L while bucket
    * sizes stay ~n/2^b, keeping the candidate join linear. */
  private def lshBuckets(vCol: String): org.apache.spark.sql.Column =
    expr(
      s"""transform(sequence(0, ${LshTables - 1}), t -> named_struct(
         |  'tbl', t,
         |  'bkt', aggregate(
         |    transform(sequence(0, ${LshBits - 1}), p ->
         |      CASE WHEN aggregate(
         |        zip_with($vCol, transform(sequence(0, size($vCol) - 1), j ->
         |          CAST(pmod(xxhash64((t * ${LshBits} + p) * 1024 + j), 1000003) AS DOUBLE) / 1000003.0 - 0.5),
         |        (x, w) -> x * w), CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0
         |      THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END),
         |    CAST(0 AS BIGINT), (acc, b) -> acc + b)))""".stripMargin)

  /** n2: LSH-bucketed ANN — candidates from any shared (table, bucket),
    * deduped, then ranked by exact cosine. rows-only; ScalaTest checks
    * recall ≥ 0.5 vs n1. */
  def n2AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = corpus(s, dir)
      .select(col("vec_id"), col("v"), col("nrm"),
        explode(lshBuckets("v")).as("tb"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("tbl"), col("bkt"))
    val pairs = broadcast(q)
      .join(e, Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("qv"), col("qn"),
        col("vec_id").as("neighbor_id"), col("v"), col("nrm"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos_raw", VectorFunctions.cosineFromParts(
        VectorFunctions.dotNative("qv", "v"), col("qn"), col("nrm")))
      .select(col("query_id"), col("neighbor_id"), col("cos_raw"))
    rankTopK(pairs)
  }

  val IvfCells = 10
  val IvfProbes = 5

  /** n3: IVF — fixed seed centroids (every 50th vector), each corpus
    * vector assigned to its nearest centroid cell; queries probe the
    * IvfProbes nearest cells. rows-only + recall ScalaTest. */
  def n3IvfAnn(s: SparkSession, dir: String): DataFrame = {
    val e = corpus(s, dir)
    val centroids = e.filter(pmod(col("vec_id"), lit(50)) === 0 &&
        col("vec_id") < IvfCells * 50)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"), col("nrm").as("cn"))
    // nearest-cell assignment for every corpus vector (argmax cosine)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cell_id").asc)
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("ccos", VectorFunctions.cosineFromParts(
        VectorFunctions.dotNative("v", "cv"), col("nrm"), col("cn")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell_id"))
    // queries probe their IvfProbes nearest cells
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cell_id").asc)
    val probes = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", VectorFunctions.cosineFromParts(
        VectorFunctions.dotNative("qv", "cv"), col("qn"), col("cn")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= IvfProbes)
      .select(col("query_id"), col("qv"), col("qn"), col("cell_id"))
    val pairs = broadcast(probes)
      .join(assigned, Seq("cell_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos_raw", VectorFunctions.cosineFromParts(
        VectorFunctions.dotNative("qv", "v"), col("qn"), col("nrm")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_raw"))
    rankTopK(pairs)
  }

  val oracles: Map[String, String] = Map(
    "n1_cosine_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |pairs AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    list_dot_product(q.v, e.v) / (q.nrm * e.nrm) AS cos_raw
         |  FROM e q JOIN e ON q.vec_id < $NumQueries AND e.vec_id <> q.vec_id),
         |ranked AS (SELECT query_id, neighbor_id, cos_raw, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
         |  FROM pairs)
         |SELECT query_id, neighbor_id, rank, round(cos_raw, 6) AS cosine
         |FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n1_cosine_topk" -> (n1CosineTopk _),
    "n2_ann_lsh" -> (n2AnnLsh _),
    "n3_ivf_ann" -> (n3IvfAnn _))
}
