package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared column helpers enforcing the determinism rules in SURVEY §4:
  * money math in exact DECIMAL (bit-identical to the DuckDB oracle once
  * cast back to double), timestamps emitted as formatted strings (never
  * raw ns/µs values).
  */
object Cols {
  /** Exact money: double → DECIMAL(12,2). Sums/products of these are
    * exact in both Spark and DuckDB, so `CAST(SUM(..) AS DOUBLE)` is
    * deterministic across engines regardless of aggregation order. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Small exact rate (discount/tax ∈ [0,1]). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact decimal sum surfaced as double. */
  def moneySum(c: Column): Column = sum(c).cast("double")

  /** Timestamp → second-granularity string (stable across Spark µs vs
    * DuckDB µs; both truncate sub-seconds when formatting). */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Timestamp (date-valued) → yyyy-MM-dd string. */
  def fmtDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Scale-adaptive parallelism floor for CPU-heavy row-local stages
    * (guide §2: derive partitioning from the data/cluster, never a
    * constant). A single-file parquet table scans as ONE task (one
    * row group ⇒ unsplittable), so a kernel-heavy pipeline above it —
    * tokenize → explode → hash — serializes on one core while the
    * rest idle. `spread` repartitions up to the session's default
    * parallelism ONLY when the frame's planned partition count is
    * below it; at 100 TB a scan already carries ≥ cores partitions
    * and this is the identity (no exchange added). Results are
    * unaffected: every consumer is key-aggregated or row-local, and
    * the gate hash is order-insensitive. */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
