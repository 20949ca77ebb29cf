package graft

import org.apache.spark.sql.SparkSession

/** Tuned `SparkSession` factory for the graft engine (SURVEY §3).
  *
  * Local settings mirror what a cluster deployment would set, scaled
  * to one JVM:
  *
  *  - `spark.sql.shuffle.partitions` = cores here; on a cluster size
  *    it to ~2-3× total executor cores, or leave AQE coalescing to
  *    shrink it per stage (enabled below).
  *  - AQE on: runtime re-planning gives skew-join splitting and
  *    partition coalescing — both matter more at 100 TB than locally.
  *  - Session timezone pinned to UTC and naive parquet timestamps read
  *    as UTC instants so results are engine- and host-independent
  *    (SURVEY §4 determinism rules).
  *  - `spark.sql.legacy.parquet.nanosAsLong`: the testdata's events.ts
  *    is TIMESTAMP(NANOS), which the vectorized reader otherwise
  *    rejects; [[Tables.events]] converts the int64 to a µs timestamp.
  *
  * Cluster-only settings intentionally NOT set here (documented for
  * deployment): executor memory/cores, dynamic allocation,
  * `spark.sql.files.maxPartitionBytes` (default 128 MB is the right
  * starting point for 100 TB parquet scans), shuffle service, and
  * `spark.sql.autoBroadcastJoinThreshold` (default 10 MB; graft also
  * broadcasts explicitly where the plan knows a side is small).
  */
object GraftSession {

  /** Builder with graft's engine settings; callers may override. */
  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      // managed tables (bucketed sinks) go to tmp, not the repo cwd
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")

  /** Standard local session (the driver mains and tests use this). */
  def local(cores: Int): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
