package graft.streaming

import graft.{Cols, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming re-expression of the reference's update flow
  * (SURVEY §2 rows 37-39): the `updates` table polled by
  * server.mjs:129-142 + sheets-code.gs is, Spark-first, a stream —
  * watermarked event time, windowed aggregation, streaming dedup
  * (the UNIQUE-constraint analog), and per-connection session state
  * (the sync_status table analog, db.mjs:76-88).
  *
  * The transforms are defined over generic DataFrames so the SAME
  * code runs in batch (Verify/oracle) and streaming (MemoryStream
  * tests): windowedCounts is used by both paths.
  */
object SyncStream {

  /** Row 37 core transform: event-time tumbling-hour aggregation.
    * Works on a batch DF or a (watermarked) streaming DF. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))

  /** st1 (batch form for the DuckDB oracle): hourly counts + exact sum. */
  def st1WindowedCounts(s: SparkSession, dir: String): DataFrame =
    windowedCounts(Tables.events(s, dir))
      .select(Cols.fmtTs(col("bucket")).as("hour"), col("n_events"), col("total_value"))
      .orderBy("hour")

  /** Row 37 streaming form: 10-minute watermark, update-mode windowed
    * aggregation (used by the MemoryStream spec). */
  def streamingWindowedCounts(events: DataFrame): DataFrame =
    windowedCounts(events.withWatermark("ts", "10 minutes"))

  val SessionGap = "30 minutes"

  /** st2 core: per-user gap-based sessions via Spark's native
    * `session_window` — the streaming-capable counterpart of e1's
    * lag+cumsum sessionization (identical session semantics: a new
    * session starts when the gap since the previous event exceeds
    * [[SessionGap]]). In batch this is one shuffle on (user_id) with
    * session merging inside the aggregate; under a watermark the SAME
    * expression runs incrementally with state expiring as sessions
    * close — which lag+cumsum cannot do. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), SessionGap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("session_value"))

  /** st2 (batch form for the DuckDB oracle): session digests. */
  def st2SessionWindow(s: SparkSession, dir: String): DataFrame =
    sessionWindows(Tables.events(s, dir))
      .select(col("user_id"),
        Cols.fmtTs(col("sw.start")).as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** Row 89 streaming form: watermarked session windows (MemoryStream
    * spec asserts stream == batch on closed sessions). */
  def streamingSessionWindows(events: DataFrame): DataFrame =
    sessionWindows(events.withWatermark("ts", "10 minutes"))

  /** st3 core: OVERLAPPING sliding windows (1-hour length, 15-minute
    * slide — w5's batch aggregation made incremental): each event
    * lands in 4 window states; a window's row closes (append mode)
    * when the watermark passes its end, so state is bounded by
    * 4 × windows-per-watermark-horizon regardless of stream length. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))

  /** st3 streaming form: watermarked sliding windows (MemoryStream
    * spec asserts closed windows == the batch form). */
  def streamingSlidingCounts(events: DataFrame): DataFrame =
    slidingCounts(events.withWatermark("ts", "10 minutes"))

  /** Row 38: streaming dedup within the watermark — the UNIQUE
    * constraint (db.mjs:32/49) as a stream operator. State is bounded
    * by the watermark horizon. */
  def streamingDedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Row 159: stream-static enrichment — every micro-batch of the
    * event stream joined against a STATIC dimension (the
    * app-metadata lookup the reference's poll loop does per update,
    * server.mjs:151-166, as one declarative join). The static side
    * broadcasts: per micro-batch the stream pays a hash-probe, never
    * a shuffle, and the dimension is re-resolvable per batch (Spark
    * re-plans static sides under AQE) so slowly-refreshed dims pick
    * up new snapshots on restart. Left join: events with no dim row
    * survive with nulls — enrichment must not drop stream rows. */
  def streamingEnrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")

  /** Row 214: the composed streaming pipeline — the reference's whole
    * poll loop as ONE declarative streaming plan: dedup (at-least-once
    * delivery collapses within the watermark) → static-dim enrichment
    * (broadcast probe per batch) → keyed latest-state upsert sink
    * (k5's merge core via foreachBatch). Each stage is a proven row
    * (38 → 159 → 71); this row proves they COMPOSE — one watermark
    * flows through, the dedup's state and the sink's merge see the
    * same event-time clock, and the target table equals the batch
    * pipeline over the deduped input (the pipe1 discipline, stream-
    * shaped). The enrichment GATES: only users present in the `dim`
    * frame (column `segment` non-null) reach the sink — the
    * reference's "registered connections only" rule
    * (server.mjs:151-166), and the observable proof the dim join ran.
    * The composition is exactly what a user replacing the reference's
    * poll loop deploys. */
  def streamingSyncPipeline(events: DataFrame, dim: DataFrame,
      targetPath: String, checkpoint: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    streamingUpsert(
      streamingEnrich(streamingDedup(events), dim)
        .filter(org.apache.spark.sql.functions.col("segment").isNotNull),
      targetPath, checkpoint)

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SyncSession(user_id: Long, n_updates: Long, last_status: String,
      last_value: Double)

  /** Row 39: per-key sync-session tracking via flatMapGroupsWithState —
    * the sync_status rollup (db.mjs:346-354) as operator state. Emits
    * the refreshed session row on every update batch; state times out
    * on the processing clock (stale-connection cleanup analog,
    * db.mjs:366-373). */
  def sessionTracker(events: Dataset[Ev],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[SyncSession] = {
    import events.sparkSession.implicits._
    val timed = timeout == GroupStateTimeout.ProcessingTimeTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SyncSession, SyncSession](
        OutputMode.Update(), timeout) {
        (userId: Long, batch: Iterator[Ev], state: GroupState[SyncSession]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val prev = state.getOption.getOrElse(SyncSession(userId, 0L, "new", 0.0))
            val last = evs.lastOption
            val next = SyncSession(userId,
              prev.n_updates + evs.size,
              last.map(e => if (e.event_type == "error") "error" else "synced")
                .getOrElse(prev.last_status),
              last.map(_.value).getOrElse(prev.last_value))
            state.update(next)
            if (timed) state.setTimeoutDuration("1 hour")
            Iterator.single(next)
          }
      }
  }

  /** Row 64: stream-stream interval join — each purchase joined to
    * clicks by the same user within the preceding 30 minutes. Both
    * sides carry watermarks, and the time-bound join condition lets
    * the engine expire click state once the watermark passes the
    * interval — bounded state, the streaming analog of the batch
    * as-of join (j2). */
  def streamingIntervalJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val c = clicks.withWatermark("ts", "40 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Row 199: stream-stream LEFT OUTER interval join — row 64's join
    * with unmatched-purchase retention: a purchase with NO click in
    * its 30-minute lookback must still come out (click_id NULL), but
    * only once the watermark proves no matching click can still
    * arrive — the "orphan conversion" feed an attribution pipeline
    * (e7's streaming analog) alerts on. Outer stream-stream joins are
    * exactly where Spark's state/watermark contract bites: the null
    * row is emitted by state EXPIRY, so emission latency is the
    * watermark delay, and without the time-interval condition state
    * would grow unboundedly. Same bounded-state argument as row 64;
    * the spec drives the watermark forward and pins both the matched
    * rows and the null-emission timing. */
  def streamingLeftOuterJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val c = clicks.withWatermark("ts", "40 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES"),
      "leftOuter")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Row 71: streaming upsert sink — the reference's core sync loop
    * (poll updates → INSERT OR REPLACE keyed rows, server.mjs:129-142
    * driving db.mjs:270-278) as a streaming pipeline. Each micro-batch
    * merges into the keyed parquet target through `foreachBatch` (the
    * OSS idiom for MERGE sinks; table formats hang their streaming
    * upsert off the same hook), reusing the k5 merge core: latest row
    * per (user_id, event_type) wins, only the partitions the batch
    * touches are read or rewritten. The target is thus always the
    * latest-state table the reference keeps in SQLite — but arriving
    * continuously and scaling with batch size, not table size. */
  def streamingUpsert(events: DataFrame, targetPath: String,
      checkpoint: String): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.sources.Sources.mergeIntoTarget(
          batch.sparkSession, batch.toDF(), targetPath)
      }
      .start()

  case class StreamHealth(batch_id: Long, n_input_rows: Long,
      max_event_time: Option[String], watermark: Option[String],
      watermark_lag_ms: Option[Long], state_rows: Long,
      dropped_late_rows: Long)

  /** Row 146: streaming observability — the per-micro-batch health
    * frame an operator of the reference's poll-sync loop
    * (server.mjs:129-142, surfaced there as sync_status) asks for in
    * production: watermark lag (how far event time runs ahead of the
    * watermark), state size, and DROPPED LATE ROWS (data quietly
    * discarded because it arrived behind the watermark — the silent
    * failure mode of every watermarked pipeline). Derived entirely
    * from Spark's own StreamingQueryProgress feed (bounded: one row
    * per retained progress entry), so it costs the pipeline nothing
    * and works identically on any cluster. An epoch-0 watermark means
    * "not yet established" and is reported as None rather than as an
    * absurd lag. */
  def progressMetrics(s: SparkSession, q: StreamingQuery): Dataset[StreamHealth] = {
    import s.implicits._
    def ms(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli
    q.recentProgress.toSeq.map { p =>
      def field(k: String): Option[String] =
        Option(p.eventTime.get(k)).filter(_.nonEmpty)
      val wm = field("watermark").filter(ms(_) > 0L)
      val lag = for (m <- field("max"); w <- wm) yield ms(m) - ms(w)
      StreamHealth(p.batchId, p.numInputRows, field("max"), wm, lag,
        p.stateOperators.map(_.numRowsTotal).sum,
        p.stateOperators.map(_.numRowsDroppedByWatermark).sum)
    }.toDS()
  }

  val oracles: Map[String, String] = Map(
    "st2_session_window" ->
      // gap sessionization; >= mirrors Spark's half-open [start,
      // last+gap) window (an event exactly gap-distant starts a NEW
      // session)
      """WITH x AS (SELECT user_id, ts, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "st1_windowed_counts" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY date_trunc('hour', ts)
        |ORDER BY hour""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_windowed_counts" -> (st1WindowedCounts _),
    "st2_session_window" -> (st2SessionWindow _))
}
