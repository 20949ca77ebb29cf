package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface (SURVEY §2 rows 40-42): CSV and JSON ingest and
  * a partition-pruned parquet sink, exercised end-to-end.
  *
  * The reference's data plane is SQLite tables plus JSON payload
  * columns; re-expressed Spark-first that's schema'd file sources. Each
  * query here round-trips driver testdata through the format and then
  * aggregates THROUGH the round-tripped copy, so the DuckDB oracle
  * (which reads the original parquet) proves the ingest was lossless:
  * schema preserved, values exact, partition pruning intact.
  *
  * Scale notes: all writes are plain `DataFrameWriter` paths — on a
  * cluster they are parallel per-partition writes (no driver
  * collection); `partitionBy` produces hive-style directories so
  * downstream filters on the partition column prune at the file
  * listing level, which is the difference between scanning 100 TB and
  * scanning one partition.
  */
object Sources {

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_sources/$name"

  /** Round-trip the lossless (integral/string) lineitem columns through
    * CSV with an explicit read schema (schema-on-read, no inference
    * pass — at 100 TB an inference pass is a full extra scan). */
  def src1CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("src1_csv")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    s.read
      .schema("l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING, l_linestatus STRING")
      .option("header", "true").csv(path)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_orderkey")).as("sum_orderkey"),
        max(col("l_linenumber")).as("max_linenumber"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Round-trip events through JSON lines (the reference's payloads are
    * JSON text) with an explicit schema, then aggregate. */
  def src2JsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("src2_json")
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .write.mode(SaveMode.Overwrite).json(path)
    s.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING")
      .json(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_user"))
      .orderBy("event_type")
  }

  /** Hive-partitioned parquet sink: write events partitioned by
    * event_type, read back with a partition filter, and aggregate.
    * The read-side filter prunes to one directory — verified in
    * PlanAuditSpec (no non-matching partitions in the scan). */
  def k1PartitionedSink(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("k1_part")
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .write.mode(SaveMode.Overwrite).partitionBy("event_type").parquet(path)
    s.read.parquet(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_event"))
      .orderBy("event_type")
  }

  val oracles: Map[String, String] = Map(
    "src1_csv_roundtrip" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  SUM(l_orderkey) AS sum_orderkey,
        |  MAX(l_linenumber) AS max_linenumber
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "src2_json_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n, SUM(user_id) AS sum_user
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "k1_partitioned_sink" ->
      """SELECT event_type, COUNT(*) AS n, SUM(event_id) AS sum_event
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src1_csv_roundtrip" -> (src1CsvRoundtrip _),
    "src2_json_roundtrip" -> (src2JsonRoundtrip _),
    "k1_partitioned_sink" -> (k1PartitionedSink _))
}
