package graft.operators

import graft.{Cols, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational core — the reference's query surface re-expressed as
  * declarative Spark plans (SURVEY §2 rows 1-12).
  *
  * Each method cites the reference query it generalizes
  * (saint0x/hive-backend, /root/reference). All are single-pass plans:
  * filters and projections reach the parquet scan; window functions
  * shuffle once on their partition keys; the "current high-watermark"
  * pattern (r4/r8) broadcasts a 1-row aggregate instead of collecting
  * to the driver, so it stays a distributed plan at any scale.
  */
object Relational {

  /** db.mjs:281-283 getActiveConnections — filtered scan + projection.
    * Predicate + column pruning push into the parquet reader. */
  def r1FilteredScan(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "error" && col("value") > 100.0)
      .select("event_id", "user_id", "value")
      .orderBy("event_id")

  /** db.mjs:285-293 getPendingUpdates — priority top-K:
    * ORDER BY priority DESC, created_at ASC LIMIT n. Compiles to
    * TakeOrderedAndProject (per-partition top-K + merge, no full sort). */
  def r2PriorityTopk(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .orderBy(col("value").desc, col("ts").asc, col("event_id").asc)
      .limit(100)
      .select("event_id", "event_type", "value")

  /** db.mjs:410-432 monitorHealth — multi-metric conditional counts in
    * one pass (single hash-aggregate, partial agg map-side). */
  def r3HealthMetrics(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(
      count(lit(1)).as("n_events"),
      count(when(col("event_type") === "error", 1)).as("n_errors"),
      countDistinct(col("user_id")).as("n_users"),
      Cols.moneySum(Cols.dec2(col("value"))).as("total_value"))

  /** db.mjs:366-373 getStaleApps — per-key high watermark below a
    * cutoff derived from the global max (broadcast 1-row agg, not a
    * driver collect). */
  def r4StaleDetection(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val maxTs = ev.agg(max(col("ts")).as("max_ts"))
    ev.groupBy(col("user_id")).agg(max(col("ts")).as("ls"))
      .crossJoin(broadcast(maxTs))
      .filter(col("ls") < col("max_ts") - expr("INTERVAL 12 HOURS"))
      .select(col("user_id"), Cols.fmtTs(col("ls")).as("last_seen"))
      .orderBy("user_id")
  }

  /** db.mjs:270-278 updateAppState INSERT OR REPLACE — read-side of an
    * upsert: last-write-wins per key via one window shuffle. */
  def r5UpsertLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("value").as("last_value"), Cols.fmtTs(col("ts")).as("last_ts"))
      .orderBy("user_id", "event_type")
  }

  /** db.mjs:32 UNIQUE(original_cell_id, slide_element_id) — exact dedup
    * on a compound key, deterministic representative (min id) via
    * groupBy instead of nondeterministic dropDuplicates. */
  def r6DedupKey(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_event_id"),
        count(lit(1)).as("n_dups"))
      .orderBy("user_id", "event_type")

  /** db.mjs:307-320 updateConnectionStatus — CASE WHEN banding
    * projection (pure narrow map, fully codegen'd). */
  def r7ConditionalProject(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_totalprice") > 400000.0, "high")
          .when(col("o_totalprice") > 150000.0, "mid")
          .otherwise("low").as("price_band"))
      .orderBy("o_orderkey")

  /** db.mjs:387-408 cleanupStaleData — retention window: rows younger
    * than max(ts) - 1 day survive (the retained set of the DELETE). */
  def r8RetentionFilter(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val maxTs = ev.agg(max(col("ts")).as("max_ts"))
    ev.crossJoin(broadcast(maxTs))
      .filter(col("ts") >= col("max_ts") - expr("INTERVAL 1 DAY"))
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** updates.content JSON payloads (db.mjs:41, server.mjs:218-229) —
    * JSON field extraction + predicate. */
  def r9JsonExtract(s: SparkSession, dir: String): DataFrame =
    // Cols.spread: per-row JSON parsing over the one-row-group events
    // scan otherwise runs on a single task
    graft.Cols.spread(Tables.events(s, dir))
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .filter(col("k") > 50)
      .orderBy("event_id")

  /** db.mjs:376-384 getRecentErrors — per-group recent top-N via
    * ranked window (one shuffle on the group key). */
  def r10TopnPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("event_type"), col("event_id"), col("rn"))
      .orderBy("event_type", "rn")
  }

  /** db.mjs:415-419 avg sync latency — mean gap between consecutive
    * events per key (lag window), summed exactly in int64. */
  def r11AvgLatency(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .agg(
        (sum(expr("timestampdiff(SECOND, prev, ts)")).cast("double") /
          count(lit(1))).as("avg_gap_sec"),
        count(lit(1)).as("n_gaps"))
  }

  /** db.mjs:334-343 getUnacknowledgedUpdates — multi-predicate filter +
    * ordered fetch. */
  def r12MultiPredicate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O" &&
        col("o_totalprice").between(100000.0, 200000.0) &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")

  /** Oracle SQL (DuckDB dialect) for the queries above. */
  val PageSize = 500 // r13 keyset page size

  /** r13: keyset pagination — the scale-correct form of the
    * reference's batched polling reads (`SELECT ... ORDER BY
    * created_at LIMIT ?`, server.mjs:129-142). OFFSET pagination
    * costs O(offset) rows on every page; keyset pagination seeks
    * `key > last_seen_key` and costs O(page) forever. Page 2 of the
    * event log: the page-1 boundary is a 1-row bounded aggregate
    * broadcast into the range filter (a runtime value, so it filters
    * above the scan; with a literal cursor from the caller it would
    * push into the scan's min/max pruning), and the page itself is
    * TakeOrderedAndProject — no global sort, no offset scan,
    * identical cost for page 2 and page 2,000,000. */
  def r13KeysetPage(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val bound = ev.orderBy(col("event_id")).limit(PageSize)
      .agg(max(col("event_id")).as("bound"))
    ev.crossJoin(broadcast(bound)) // 1-row bounded metadata
      .filter(col("event_id") > col("bound"))
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id")).limit(PageSize)
  }

  val oracles: Map[String, String] = Map(
    "r13_keyset_page" ->
      s"""SELECT event_id, user_id, event_type FROM events
         |WHERE event_id > (SELECT MAX(event_id) FROM
         |  (SELECT event_id FROM events ORDER BY event_id LIMIT $PageSize))
         |ORDER BY event_id LIMIT $PageSize""".stripMargin,
    "r1_filtered_scan" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'error' AND value > 100.0
        |ORDER BY event_id""".stripMargin,
    "r2_priority_topk" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE event_type IN ('click','view')
        |ORDER BY value DESC, ts ASC, event_id ASC LIMIT 100""".stripMargin,
    "r3_health_metrics" ->
      """SELECT COUNT(*) AS n_events,
        |  COUNT(CASE WHEN event_type='error' THEN 1 END) AS n_errors,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events""".stripMargin,
    "r4_stale_detection" ->
      """SELECT user_id, strftime(ls, '%Y-%m-%d %H:%M:%S') AS last_seen
        |FROM (SELECT user_id, max(ts) AS ls FROM events GROUP BY user_id)
        |WHERE ls < (SELECT max(ts) FROM events) - INTERVAL 12 HOUR
        |ORDER BY user_id""".stripMargin,
    "r5_upsert_latest" ->
      """SELECT user_id, event_type, value AS last_value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "r6_dedup_key" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_event_id,
        |  COUNT(*) AS n_dups
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "r7_conditional_project" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_totalprice > 400000.0 THEN 'high'
        |       WHEN o_totalprice > 150000.0 THEN 'mid'
        |       ELSE 'low' END AS price_band
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "r8_retention_filter" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 DAY
        |ORDER BY event_id""".stripMargin,
    "r9_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events
        |WHERE CAST(props->>'$.k' AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,
    "r10_topn_per_group" ->
      """SELECT event_type, event_id, rn
        |FROM (SELECT event_type, event_id, ROW_NUMBER() OVER (
        |        PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn <= 5 ORDER BY event_type, rn""".stripMargin,
    "r11_avg_latency" ->
      """WITH g AS (SELECT user_id, ts,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT CAST(SUM((epoch_us(ts) - epoch_us(prev)) // 1000000) AS DOUBLE)
        |    / COUNT(*) AS avg_gap_sec,
        |  COUNT(*) AS n_gaps
        |FROM g WHERE prev IS NOT NULL""".stripMargin,
    "r12_multi_predicate" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O'
        |  AND o_totalprice BETWEEN 100000.0 AND 200000.0
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r1_filtered_scan" -> (r1FilteredScan _),
    "r2_priority_topk" -> (r2PriorityTopk _),
    "r3_health_metrics" -> (r3HealthMetrics _),
    "r4_stale_detection" -> (r4StaleDetection _),
    "r5_upsert_latest" -> (r5UpsertLatest _),
    "r6_dedup_key" -> (r6DedupKey _),
    "r7_conditional_project" -> (r7ConditionalProject _),
    "r8_retention_filter" -> (r8RetentionFilter _),
    "r9_json_extract" -> (r9JsonExtract _),
    "r10_topn_per_group" -> (r10TopnPerGroup _),
    "r11_avg_latency" -> (r11AvgLatency _),
    "r12_multi_predicate" -> (r12MultiPredicate _),
    "r13_keyset_page" -> (r13KeysetPage _))
}
