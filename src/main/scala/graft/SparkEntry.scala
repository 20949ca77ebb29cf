package graft

import graft.operators._
import graft.sources.{Migrations, Sources}
import graft.streaming.SyncStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory)
  * and §7 (build plan). Every operator family contributes its
  * `queries` (Spark plans) and `oracleSql` (DuckDB-dialect equivalents
  * for the driver's correctness gate).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q3TopkRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Analytics.queries ++ Dedup.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Multimodal.queries ++
      SyncStream.queries ++ Sources.queries ++ Migrations.queries ++
      Pipeline.queries ++ Profiling.queries ++ Quality.queries ++
      Mining.queries ++ TextIndex.queries ++ Graph.queries ++
      TimeSeries.queries ++ EntityResolution.queries ++ Incremental.queries ++
      IncrementalAnn.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (non-SQL-expressible ops,
    * e.g. LSH/sketches) get the driver's weaker rows-only check and are
    * covered by ScalaTest instead. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Analytics.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ TextAnalysis.oracles ++ Multimodal.oracles ++
      SyncStream.oracles ++ Sources.oracles ++ Migrations.oracles ++
      Pipeline.oracles ++ Profiling.oracles ++ Quality.oracles ++
      Mining.oracles ++ TextIndex.oracles ++ Graph.oracles ++
      TimeSeries.oracles ++ EntityResolution.oracles ++ Incremental.oracles ++
      IncrementalAnn.oracles
}
