package graft

import java.sql.Timestamp
import graft.streaming.SyncStream
import graft.streaming.SyncStream.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming specs (SURVEY §2 rows 37-39) driven through
  * MemoryStream — watermarked windowed aggregation, in-watermark
  * dedup, and flatMapGroupsWithState session tracking.
  */
class StreamingSpec extends GraftSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private def ev(id: Long, min: Int, user: Long, typ: String = "click",
      value: Double = 1.0): Ev = Ev(id, ts(min), user, typ, value)

  test("row 37: streaming windowed counts match the batch transform") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = SyncStream.streamingWindowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win").outputMode("update").start()
    try {
      input.addData(ev(1, 0, 1), ev(2, 10, 1), ev(3, 70, 2, value = 2.5))
      q.processAllAvailable()
      val rows = spark.table("win")
        .groupBy("bucket").agg(max("n_events").as("n_events"))
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(rows.values.sum == 3 && rows.size == 2)
    } finally q.stop()
  }

  test("row 146: progress metrics count dropped late rows and surface watermark lag") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    // sliding windows: a true event-time-windowed aggregate, so the
    // watermark actually FILTERS late rows (st1's date_trunc grouping
    // has no window column for the watermark to act on)
    val q = SyncStream.streamingSlidingCounts(input.toDF())
      .writeStream.format("memory").queryName("health").outputMode("append").start()
    try {
      // batch 1 establishes event time; batch 2 advances the watermark
      // to max(batch 1) - 10 min = minute 50, then to minute 80
      input.addData(ev(1, 0, 1), ev(2, 60, 1))
      q.processAllAvailable()
      input.addData(ev(3, 90, 2))
      q.processAllAvailable()
      // batch 3: minute 5's every sliding window ends by minute 60 —
      // behind the watermark, silently dropped by the stateful
      // aggregate; the health frame must say so
      input.addData(ev(4, 5, 1), ev(5, 95, 2))
      q.processAllAvailable()
      // progress entries are posted asynchronously after the batch
      // commits — poll the health frame until the late-row drop lands
      def healthNow() = SyncStream.progressMetrics(spark, q).collect()
      val deadline = System.nanoTime + 20L * 1000 * 1000 * 1000
      while (System.nanoTime < deadline &&
        healthNow().map(_.dropped_late_rows).sum < 1) Thread.sleep(200)
      val health = healthNow()
      assert(health.nonEmpty)
      assert(health.map(_.dropped_late_rows).sum >= 1,
        s"late row not counted (${q.recentProgress.length} progress entries): " +
          health.mkString("\n"))
      // once established, the watermark trails max event time: lag >= 0
      val lags = health.flatMap(_.watermark_lag_ms)
      assert(lags.nonEmpty && lags.forall(_ >= 0L), s"lags: ${lags.toSeq}")
      // the windowed aggregate holds open-window state
      assert(health.map(_.state_rows).max >= 1)
      // batches before any watermark report None, never epoch-0 lag
      assert(health.forall(h => h.watermark_lag_ms.forall(_ < 24L * 3600 * 1000)))
    } finally q.stop()
  }

  test("row 89: streaming session windows merge and close like the batch form") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    // session-window streaming aggregation supports APPEND: a session
    // row is emitted once, when the watermark passes its end
    val q = SyncStream.streamingSessionWindows(input.toDF())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min
      // gap (> SessionGap=30) opens a SECOND session; user 2: one event
      input.addData(ev(1, 0, 1), ev(2, 10, 1, value = 2.0))
      q.processAllAvailable()
      input.addData(ev(3, 50, 1, value = 4.0), ev(4, 5, 2, value = 8.0))
      q.processAllAvailable()
      // sentinel far in the future closes every real session (its own
      // session stays open and is never emitted)
      input.addData(ev(99, 200, 99))
      q.processAllAvailable()
      val got = spark.table("sess")
        .collect().map(r => (r.getLong(0), r.getStruct(1).getTimestamp(0)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(got == Map(
        (1L, ts(0)) -> ((2L, 3.0)), // merged session: events at 0 and 10
        (1L, ts(50)) -> ((1L, 4.0)), // new session after the 40-min gap
        (2L, ts(5)) -> ((1L, 8.0))), s"got $got")
      // batch equivalence on the same (non-sentinel) events
      val batch = SyncStream.sessionWindows(
        Seq(ev(1, 0, 1), ev(2, 10, 1, value = 2.0),
          ev(3, 50, 1, value = 4.0), ev(4, 5, 2, value = 8.0)).toDF())
        .collect().map(r => (r.getLong(0), r.getStruct(1).getTimestamp(0)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(batch == got, "stream state diverged from the batch transform")
    } finally q.stop()
  }

  test("st3: streaming sliding windows close like the batch form, 4 windows per event") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = SyncStream.streamingSlidingCounts(input.toDF())
      .writeStream.format("memory").queryName("slide").outputMode("append").start()
    try {
      val real = Seq(ev(1, 0, 1), ev(2, 10, 1, value = 2.0), ev(3, 40, 2, value = 4.0))
      input.addData(real: _*)
      q.processAllAvailable()
      // sentinel far ahead closes every real window (its own stay open)
      input.addData(ev(99, 500, 99))
      q.processAllAvailable()
      val got = spark.table("slide")
        .collect().map(r => r.getStruct(0).getTimestamp(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
      val batch = SyncStream.slidingCounts(real.toDF())
        .collect().map(r => r.getStruct(0).getTimestamp(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
      assert(got == batch, s"stream $got != batch $batch")
      // overlap invariant: each event is counted in exactly 4 windows
      assert(got.values.map(_._1).sum == 4L * real.size)
    } finally q.stop()
  }

  test("row 38: duplicate event_ids within the watermark collapse to one") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = SyncStream.streamingDedup(input.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(ev(1, 0, 1), ev(1, 1, 1), ev(2, 2, 1), ev(1, 3, 1))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0))
      assert(ids.sorted.sameElements(Array(1L, 2L)))
    } finally q.stop()
  }

  test("row 159: stream-static enrichment broadcasts the dim and keeps unmatched rows") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[Ev]
    val q = SyncStream.streamingEnrich(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      input.addData(ev(1, 0, 1), ev(2, 10, 2), ev(3, 20, 99))
      q.processAllAvailable()
      val rows = spark.table("enrich").collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[String]("tier"))).toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
      // the static side must broadcast, not shuffle the micro-batch
      val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"dim must broadcast:\n$plan")
    } finally q.stop()
  }

  test("row 39: session tracker accumulates per-user state across batches") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    // NoTimeout in the test: ProcessingTimeTimeout makes the
    // micro-batch engine re-run batches continuously to evaluate
    // timeouts, which never settles under processAllAvailable.
    val q = SyncStream.sessionTracker(input.toDS(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("sess").outputMode("update").start()
    try {
      input.addData(ev(1, 0, 7), ev(2, 1, 7, value = 5.0))
      q.processAllAvailable()
      input.addData(ev(3, 2, 7, typ = "error", value = 9.0), ev(4, 2, 8))
      q.processAllAvailable()
      val byUser = spark.table("sess").collect()
        .groupBy(_.getAs[Long]("user_id"))
      // user 7: second emission sees cumulative 3 updates, error status
      val u7 = byUser(7L).maxBy(_.getAs[Long]("n_updates"))
      assert(u7.getAs[Long]("n_updates") == 3)
      assert(u7.getAs[String]("last_status") == "error")
      assert(u7.getAs[Double]("last_value") == 9.0)
      val u8 = byUser(8L).head
      assert(u8.getAs[Long]("n_updates") == 1)
      assert(u8.getAs[String]("last_status") == "synced")
    } finally q.stop()
  }

  test("row 64: stream-stream interval join matches the batch equivalent") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = SyncStream.streamingIntervalJoin(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("sjoin").outputMode("append").start()
    try {
      clicks.addData(ev(1, 0, 1), ev(2, 25, 1), ev(3, 100, 1), ev(4, 10, 2))
      purchases.addData(ev(10, 30, 1), ev(11, 120, 1), ev(12, 50, 2))
      q.processAllAvailable()
      val got = spark.table("sjoin")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // purchase 10 (t=30, user 1): clicks at 0 (30 min before, inclusive) and 25
      // purchase 11 (t=120, user 1): click at 100
      // purchase 12 (t=50, user 2): click at 10 is 40 min before -> excluded
      assert(got == Set((10L, 1L), (10L, 2L), (11L, 3L)))
    } finally q.stop()
  }

  test("row 199: left-outer interval join emits orphans only after watermark expiry") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = SyncStream.streamingLeftOuterJoin(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("lojoin").outputMode("append").start()
    try {
      // user 1's purchase has a click in range; user 2's does not
      clicks.addData(ev(1, 25, 1))
      purchases.addData(ev(10, 30, 1), ev(12, 50, 2))
      q.processAllAvailable()
      def rows() = spark.table("lojoin")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
        .toSet
      val early = rows()
      assert(early.contains((10L, Some(1L))), s"matched pair missing: $early")
      assert(!early.exists(r => r._1 == 12L && r._2.isEmpty),
        "orphan purchase must NOT emit before the watermark proves no click can arrive")
      // drive the watermark far past purchase 12's interval on BOTH
      // streams (the global watermark is the min across inputs)
      clicks.addData(ev(99, 500, 9)); purchases.addData(ev(98, 500, 9))
      q.processAllAvailable()
      // one more advance so the state-expiry batch runs after the
      // watermark update is in force
      clicks.addData(ev(97, 600, 9)); purchases.addData(ev(96, 600, 9))
      q.processAllAvailable()
      val late = rows()
      assert(late.contains((12L, None)),
        s"orphan purchase must emit with NULL click after expiry: $late")
    } finally q.stop()
  }

  test("row 214: the composed sync pipeline dedups, gates on the dim, and upserts") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val base = s"${graft.TmpRoots.perProcess("graft_stream")}/pipe_${System.nanoTime()}"
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val input = MemoryStream[Ev]
    val q = SyncStream.streamingSyncPipeline(input.toDF(), dim, base, base + "_ckpt")
    try {
      // duplicate event_id 1 must collapse; user 9 is NOT in the dim
      input.addData(ev(1, 0, 1, "click", 1.0), ev(1, 0, 1, "click", 1.0),
        ev(2, 1, 2, "view", 2.0), ev(3, 2, 9, "click", 3.0))
      q.processAllAvailable()
      // second batch updates user 1's key: latest wins through the sink
      input.addData(ev(4, 5, 1, "click", 8.0), ev(2, 1, 2, "view", 2.0))
      q.processAllAvailable()
      val got = spark.read.parquet(base)
        .select("user_id", "event_type", "value").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(got == Map((1L, "click") -> 8.0, (2L, "view") -> 2.0),
        s"got $got")
      // the unknown user was gated out by the enrichment, and the
      // re-delivered event_id 2 did not perturb the target
      assert(!got.keySet.exists(_._1 == 9L))
    } finally q.stop()
  }

  test("row 71: streaming upsert target always holds the latest row per key") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val base = s"${graft.TmpRoots.perProcess("graft_stream")}/upsert_${System.nanoTime()}"
    val input = MemoryStream[Ev]
    val q = SyncStream.streamingUpsert(input.toDF(), base, base + "_ckpt")
    try {
      // batch 1 bootstraps; includes an in-batch duplicate key (user 1
      // click at t=0 and t=3 — the later row must win)
      input.addData(ev(1, 0, 1, "click", 1.0), ev(2, 1, 1, "view", 2.0),
        ev(3, 2, 2, "click", 3.0), ev(6, 3, 1, "click", 7.5))
      q.processAllAvailable()
      // batch 2: update an existing key and insert a brand-new one
      input.addData(ev(4, 5, 1, "click", 9.0), ev(5, 6, 3, "view", 4.0))
      q.processAllAvailable()
      val got = spark.read.parquet(base)
        .select("user_id", "event_type", "value").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(got == Map(
        (1L, "click") -> 9.0, (1L, "view") -> 2.0,
        (2L, "click") -> 3.0, (3L, "view") -> 4.0))
    } finally q.stop()
  }

  test("row 71: upsert restarted from checkpoint neither loses nor duplicates keys") {
    // the reference's poll loop survives process restarts
    // (server.mjs:129-142); the streaming upsert must too: stop the
    // query, let data arrive while it is down, restart from the SAME
    // checkpoint, and the target must converge to exactly the
    // latest-row-per-key state with no replayed duplicates.
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val base = s"${graft.TmpRoots.perProcess("graft_stream")}/restart_${System.nanoTime()}"
    val input = MemoryStream[Ev]
    val q1 = SyncStream.streamingUpsert(input.toDF(), base, base + "_ckpt")
    try {
      input.addData(ev(1, 0, 1, "click", 1.0), ev(2, 1, 2, "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop() // planned or unplanned, the checkpoint is the truth
    // arrives while the pipeline is down: an update and a new key
    input.addData(ev(3, 5, 1, "click", 8.0), ev(4, 6, 3, "view", 4.0))
    val q2 = SyncStream.streamingUpsert(input.toDF(), base, base + "_ckpt")
    try {
      q2.processAllAvailable()
      // one more live batch after the restart
      input.addData(ev(5, 9, 2, "view", 6.0))
      q2.processAllAvailable()
      val rows = spark.read.parquet(base)
        .select("user_id", "event_type", "value").collect()
      val got = rows.map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(rows.length == got.size, "restart produced duplicate keys")
      assert(got == Map(
        (1L, "click") -> 8.0, (2L, "view") -> 6.0, (3L, "view") -> 4.0),
        s"state after restart diverged: $got")
    } finally q2.stop()
  }

  test("file-source end-to-end: parquet stream + AvailableNow equals batch") {
    // the production shape: readStream over a parquet directory,
    // process everything currently present, terminate (AvailableNow)
    val srcDir = s"${graft.TmpRoots.perProcess("graft_stream")}/src"
    val ckpt = s"${graft.TmpRoots.perProcess("graft_stream")}/ckpt_${System.nanoTime()}"
    val batchEvents = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    batchEvents.write.mode("overwrite").parquet(srcDir)
    val streamed = spark.readStream
      .schema(batchEvents.schema)
      .parquet(srcDir)
    val q = SyncStream.streamingWindowedCounts(streamed)
      .writeStream.format("memory").queryName("filewin")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000L)
      val got = spark.table("filewin")
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      val want = SyncStream.windowedCounts(batchEvents)
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("row 290: windowed counts run unchanged on the RocksDB state store") {
    // the 100 TB state backend: HDFSBackedStateStore keeps every key
    // in executor heap, RocksDB spills to local disk — the SAME query
    // must produce the SAME results with only a conf flip
    implicit val sqlc = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Ev]
      val q = SyncStream.streamingWindowedCounts(input.toDF())
        .writeStream.format("memory").queryName("win_rocks")
        .outputMode("update").start()
      try {
        input.addData(ev(1, 0, 1), ev(2, 10, 1), ev(3, 70, 2, value = 2.5))
        q.processAllAvailable()
        input.addData(ev(4, 75, 2), ev(5, 12, 3, value = 4.0))
        q.processAllAvailable()
        // the provider actually engaged
        val used = q.lastProgress.stateOperators(0).customMetrics
        assert(used.containsKey("rocksdbFilesCopied") ||
          used.keySet.toString.contains("rocksdb"),
          s"expected RocksDB state metrics, got: ${used.keySet}")
        val rows = spark.table("win_rocks")
          .groupBy("bucket").agg(max("n_events").as("n_events"),
            max("total_value").as("total_value"))
          .collect().map(r => r.getTimestamp(0) ->
            (r.getLong(1), r.getDouble(2))).toMap
        assert(rows.values.map(_._1).sum == 5 && rows.size == 2)
        // batch equivalence on the same rows (the row-37 invariant,
        // now under the scale-grade backend)
        val batch = SyncStream.windowedCounts(
          Seq(ev(1, 0, 1), ev(2, 10, 1), ev(3, 70, 2,
            value = 2.5), ev(4, 75, 2), ev(5, 12, 3, value = 4.0)).toDF())
        val exp = batch.collect().map(r => r.getTimestamp(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
        assert(rows == exp, "RocksDB-backed stream == batch transform")
      } finally q.stop()
    } finally {
      prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
    }
  }

  test("row 291: observe() collects pipeline metrics in the same pass as the output") {
    // single-pass observability: a 100 TB curation job cannot afford a
    // second scan just to count what it kept — observe() rides the
    // output action
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation("prep_metrics")
    val out = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .observe(obs, count(lit(1)).as("n_kept"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("kept_value"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val outRows = out.collect()
    val m = obs.get
    val direct = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), sum(col("value").cast("decimal(18,6)")).cast("double"))
      .head()
    assert(m("n_kept") == direct.getLong(0),
      "observed count == direct recompute, with zero extra scans")
    assert(m("kept_value") == direct.getDouble(1))
    assert(outRows.map(_.getAs[Long]("n")).sum == direct.getLong(0),
      "the observed pass also produced the real output")
  }
}
