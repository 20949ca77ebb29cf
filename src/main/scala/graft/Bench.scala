package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  * Queries are materialized with a noop-format write so every output
  * column is computed (a bare count() would let Catalyst prune the
  * projections being measured).
  *
  * Evidence durability (the round-5 lesson): the driver's round-5
  * capture was rc=124/parsed:null because the n=5-pass run outran the
  * driver's time budget and the old Bench persisted nothing until all
  * passes finished. This version is timeout-proof three ways:
  *  1. `bench_last.json` is atomically rewritten after EVERY measured
  *     query with the current per-query mins — a kill at any instant
  *     leaves a parseable, at-most-one-query-stale evidence file.
  *  2. Per-query errors are appended to `bench_errors.log` the moment
  *     they are caught (query name + pass + stack head), so a killed
  *     run also keeps the error that made it slow.
  *  3. SPARK_GRAFT_TIME_BUDGET (seconds, default 540) is honored: a
  *     pass is only started if the budget fits elapsed + 1.08× the
  *     fastest completed pass (the steady-state estimate — pass 1 is
  *     inflated by one-time index builds), so the run ENDS cleanly —
  *     printing its one-line JSON to stdout — instead of being killed
  *     mid-pass. The line reports `passes` completed vs
  *     `runs_requested`; `partial` is reserved for truncated evidence
  *     (a mid-pass kill), because a clean budget stop after N full
  *     passes is a complete min-of-N measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val t0main = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Pre-pass sweep: drop scratch roots left by DEAD graft JVMs (a
    // killed bench never reaches its shutdown hook) and legacy
    // fixed-name/test leftovers, so repeated rounds don't accrete in
    // /tmp. The shared durable catalog (/tmp/graft_state) is NOT swept
    // — persistence across restarts is its point.
    Seq("graft_sources", "graft_pipe3_release", "graft_bench_state",
      "graft_stream", "graft_publish_spec", "graft_persist",
      "graft_ann_index", "graft_ann_restart",
      "graft_scale_state").foreach(TmpRoots.cleanStale)
    TmpRoots.cleanLegacy("graft_persist_state\\d+", "graft_publish\\d+",
      "graft_publish2\\d+", "graft_publish_tt\\d+", "graft_test",
      "graft_stream_(ckpt|restart|upsert)_\\d+(_ckpt)?", "graft_stream_src")
    // Bench runs in its OWN catalog/warehouse dir: embedded Derby is
    // single-process, so sharing /tmp/graft_state with a concurrently
    // running verify/test JVM would fail one of them. Bucketed-table
    // pay-once setup (k2) lands in pass 1 and is amortized by min-of-N.
    val stateDir = TmpRoots.perProcess("graft_bench_state")
    // The bench session runs on the IN-MEMORY catalog by default
    // (SPARK_GRAFT_CATALOG=hive restores Derby): embedded-Derby
    // metastore creation costs ~8-12 s of the driver's fixed bench
    // budget and buys nothing measured — catalog DURABILITY is proven
    // by PersistenceSpec/AnnPersistenceSpec on the hive path, while
    // every benched query plans and executes identically on either
    // catalog (bucketed saveAsTable included).
    val catalog = sys.env.getOrElse("SPARK_GRAFT_CATALOG", "in-memory")
    val builder0 = GraftSession.builder(cpus.toInt, stateDir)
    val spark = (if (catalog == "hive") builder0
      else builder0.config("spark.sql.catalogImplementation", "in-memory"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Runtime conf overrides for bench experiments, e.g.
    // SPARK_GRAFT_CONF="spark.sql.adaptive.enabled=false;spark.x=y"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    // warm up the JVM/scheduler/file-system paths once so the first
    // measured query doesn't absorb session start-up cost
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1).collect()
    // Every pass calls fn() anew, ON PURPOSE (a round-11 probe measured
    // the alternative and REVERTED it): caching the constructed
    // DataFrame across passes looks like prepared-statement reuse, but
    // iterative operators (g2's power iteration, g6's BFS, the ts13/
    // ts14 series frames) materialize eager localCheckpoints DURING
    // construction — a cached frame re-reads those blocks instead of
    // re-running the iteration, so "min of N" degenerates into "read a
    // cached result N−1 times" (g2 reported 0.2 s for 4.9 s of real
    // work; suite geomean flattered 0.78×→0.58×). Honest steady state
    // = re-execute the whole query; only per-CORPUS artifacts (durable
    // indexes) amortize across passes.
    def run(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // min over N INTERLEAVED passes of the whole suite
    // (SPARK_GRAFT_RUNS, clamped to >=1). Two reasons for min-of-N:
    // later passes measure steady-state (code already JIT'd/codegen-
    // cached), and the min rejects transient host stalls. The passes
    // are interleaved (suite × N, not query × N back-to-back) because
    // the stalls observed on this VM are BURSTY — a busy window
    // lasting tens of seconds inflates every back-to-back attempt of
    // the queries inside it, while under interleaving the same window
    // hits a different stretch of the suite each pass and the
    // per-query min survives. SPARK_GRAFT_ONLY=q1,q2 restricts to a
    // subset. A query that throws must NOT silently bench as "fast":
    // its error is recorded and surfaces in the output line.
    val runsReq = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "4").toInt)
    // Default budget raised 540→720 in r13 (verdict ask #3): at 540 s
    // the r12 sf0.1 capture fit only 2 of 4 passes (pass 1 carries
    // one-time index builds at ~200 s; steady-state passes run
    // ~150 s), and min-of-2 left uniform ~1.6× noise on sub-second
    // queries that took a git-diff excursion to clear. 720 s fits
    // pass 1 + three steady passes; the per-query flush keeps any
    // external kill bounded to one-query-stale evidence.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_TIME_BUDGET", "720").toDouble
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val best = scala.collection.mutable.Map.empty[String, Double]
    // every observation per query (pass order), not just the min —
    // the r12 bench artifact's uniform ~1.6× "regressions" on
    // unchanged sub-second queries took a git-diff excursion to rule
    // out; with per-pass samples in the artifact, min-of-N noise is
    // diagnosable from the file alone (r12 verdict ask #7)
    val samples = scala.collection.mutable
      .Map.empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    val errs0 = scala.collection.mutable.Map.empty[String, String]
    val errLog = java.nio.file.Paths.get("bench_errors.log")
    // sf-mismatch guard (the committed bench_last.json is sealed
    // per-round evidence at the reference sf — a local capture at a
    // different sf diverts to its own file instead of clobbering it;
    // the builder hit that trap twice)
    val flushPath: String = {
      val tgt = flushTarget(sfDir)
      if (tgt != "bench_last.json")
        System.err.println(s"[bench] sf '$sfDir' is not the reference " +
          s"sf ($ReferenceSfName) — writing $tgt instead")
      tgt
    }
    // run-start marker so errors from different runs never blur
    // together when reading the accumulated log after a kill
    java.nio.file.Files.writeString(errLog,
      s"# run ${java.time.Instant.now()} sf=$sfDir runs=$runsReq budget=${budgetSec}s\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    def elapsed: Double = (System.nanoTime() - t0main) / 1e9
    val passSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    def jsonLine(passes: Int, partial: Boolean): String = {
      val results = queries.flatMap { case (name, _) =>
        best.get(name).map(v => (name, v, errs0.get(name)))
      }
      val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val smp = results.map { case (k, _, _) =>
        "\"" + k + "\":" + samples.getOrElse(k, Nil)
          .map(d => math.rint(d * 1000) / 1000).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val errs = results.collect { case (k, _, Some(e)) =>
        "\"" + k + "\":\"" + JsonUtil.escape(e) + "\""
      }.mkString("{", ",", "}")
      val total = results.map(_._2).sum
      val ps = passSecs.map(p => math.rint(p * 10) / 10).mkString("[", ",", "]")
      val nb = noiseBandJson(samples.view.mapValues(_.toSeq).toMap, passSecs.toSeq)
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"samples":$smp,"errors":$errs,"n_errors":${results.count(_._3.isDefined)},"passes":$passes,"runs_requested":$runsReq,"pass_secs":$ps,"noise_band":$nb,"partial":$partial,"sf":"$sfDir"}"""
    }
    // Atomic rewrite (tmp + move) so a reader never sees a torn file;
    // subset runs don't clobber the durable full-suite evidence.
    def flush(passes: Int, partial: Boolean): Unit = if (only.isEmpty) {
      val tmp = java.nio.file.Paths.get(flushPath + ".tmp")
      java.nio.file.Files.writeString(tmp, jsonLine(passes, partial) + "\n")
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(flushPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    var passesDone = 0
    var minPassSec = Double.MaxValue
    var stoppedOnBudget = false
    for (pass <- 1 to runsReq if !stoppedOnBudget) {
      // Start a pass only if it plausibly fits: first pass always runs
      // (there is no estimate yet, and zero passes is worse evidence
      // than one truncated-but-flushed pass). The estimate is the MIN
      // completed-pass duration — pass 1 carries the one-time index
      // builds, so gating pass 3 on pass 2's steady-state time (not an
      // inflated pass-1 reading) is what lets a 3-pass run fit the
      // budget; 8% headroom absorbs host noise, and a mis-estimate is
      // bounded harm because bench_last.json flushes after every query.
      if (pass > 1 && elapsed + 1.08 * minPassSec > budgetSec) {
        stoppedOnBudget = true
      } else {
        val tPass = System.nanoTime()
        for ((name, fn) <- queries) {
          val t0 = System.nanoTime()
          try run(name, fn) catch {
            case e: Throwable =>
              val head = e.getStackTrace.take(3).mkString(" <- ")
              java.nio.file.Files.writeString(errLog,
                s"${java.time.Instant.now()} pass=$pass query=$name ${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}\n  at $head\n",
                java.nio.file.StandardOpenOption.CREATE,
                java.nio.file.StandardOpenOption.APPEND)
              errs0.getOrElseUpdate(name,
                s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
          }
          val dt = (System.nanoTime() - t0) / 1e9
          best.updateWith(name)(v => Some(v.fold(dt)(math.min(_, dt))))
          samples.getOrElseUpdate(name,
            scala.collection.mutable.ArrayBuffer.empty[Double]) += dt
          flush(passesDone, partial = true)
        }
        val passSec = (System.nanoTime() - tPass) / 1e9
        passSecs += passSec
        minPassSec = math.min(minPassSec, passSec)
        passesDone += 1
        flush(passesDone, partial = false)
      }
    }
    // `partial` flags TRUNCATED evidence (a kill mid-pass — the
    // per-query flushes above carry partial=true until a pass
    // completes). A clean budget stop after N full passes is a
    // complete min-of-N measurement: every query holds N full
    // observations, and `passes` vs `runs_requested` records that the
    // budget, not a failure, bounded N.
    val line = jsonLine(passesDone, partial = false)
    println(line)
    flush(passesDone, partial = false)
    // The driver keeps only a 2000-char tail of stdout and parses its
    // last line; the full 136-query line above is ~5 KB, so it was
    // parsed:null for three straight rounds. Print a COMPACT summary as
    // the final line — guaranteed < 2000 chars — keeping the driver's
    // {"metric","value","unit","sf"} contract and pointing at the
    // committed bench_last.json for per-query detail.
    val total = queries.flatMap { case (n, _) => best.get(n) }.sum
    println(compactLine(best, errs0, total, passesDone, runsReq, sfDir,
      passSecs.toSeq,
      noiseBandJson(samples.view.mapValues(_.toSeq).toMap, passSecs.toSeq)))
    spark.stop()
  }

  /** The run's own noise band (r14 verdict ask #8) — cross-round
    * deltas self-qualify from the artifact instead of needing a
    * side-channel note about a degraded host. Two measures, both
    * computable after the fact from `samples`/`pass_secs` but
    * precomputed here so a reader (or the round judge) doesn't have
    * to: `per_query_p50`/`p90` = percentiles over each query's
    * (2nd-smallest ÷ smallest) sample ratio — 1.0x is a perfectly
    * repeatable host, the r12 incident read ~1.6x; `pass_spread` =
    * max÷min of the STEADY passes (pass 1 carries one-time index
    * builds and is excluded). A cross-round per-query delta smaller
    * than the band is host noise, not a regression. */
  private[graft] def noiseBandJson(samples: collection.Map[String, Seq[Double]],
      passSecs: Seq[Double]): String = {
    val ratios = samples.valuesIterator.flatMap { ss0 =>
      val ss = ss0.sorted
      if (ss.size >= 2 && ss.head > 0) Some(ss(1) / ss.head) else None
    }.toSeq.sorted
    def pct(p: Double): Double =
      if (ratios.isEmpty) 1.0
      else ratios(math.min(ratios.size - 1, math.round(p * (ratios.size - 1)).toInt))
    val steady = passSecs.drop(1)
    val spread =
      if (steady.size >= 2 && steady.min > 0) steady.max / steady.min else 1.0
    def r3(x: Double) = math.rint(x * 1000) / 1000
    s"""{"per_query_p50":${r3(pct(0.5))},"per_query_p90":${r3(pct(0.9))},""" +
      s""""pass_spread":${r3(spread)},"n":${ratios.size}}"""
  }

  /** The reference scale factor the sealed bench_last.json holds
    * (basename of the sf dir; `SPARK_GRAFT_REFERENCE_SF` overrides
    * for a deliberate re-baseline). Pinned as a constant (r13 advice
    * #5): the old guard trusted the COMMITTED file's self-declared sf
    * field, so it failed OPEN whenever that file was missing or
    * unparseable — one bad overwrite permanently re-aimed the guard
    * at the wrong sf. */
  private[graft] val ReferenceSfName: String =
    sys.env.getOrElse("SPARK_GRAFT_REFERENCE_SF", "sf0.1")

  /** Where this run's evidence flushes. The committed bench_last.json
    * is sealed per-round evidence at the reference sf; a capture at
    * any OTHER sf must not clobber it (r12 verdict ask #7 — the
    * builder hit the trap twice), so a non-reference sf diverts the
    * write to `bench_last.<sfname>.json`. Trailing path separators
    * are normalized before taking the basename (r13 advice #5: a
    * trailing slash used to produce "bench_last..json"). Visible for
    * the guard spec. */
  private[graft] def flushTarget(sfDir: String,
      refSf: String = ReferenceSfName): String = {
    val base = sfDir.replaceAll("[/\\\\]+$", "").replaceAll(".*/", "")
      .replaceAll("[^A-Za-z0-9.]", "_")
    if (base == refSf) "bench_last.json" else s"bench_last.$base.json"
  }

  /** Geomean of (our min-time / cohort time) over queries present in
    * both this run and the given cohort text slice. Cohorts are flat
    * {"name": seconds} pairs, so a regex parse suffices (no JSON
    * library in the unmanaged classpath). */
  private def geomeanOver(cohortTxt: String,
      best: collection.Map[String, Double]): Option[(Double, Int)] = {
    val pair = """"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.eE+-]*)""".r
    val baseline = pair.findAllMatchIn(cohortTxt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val shared = best.keys.toSeq.filter(baseline.contains)
    if (shared.isEmpty) None
    else {
      val logSum = shared.map(q => math.log(best(q) / baseline(q))).sum
      Some((math.exp(logSum / shared.size), shared.size))
    }
  }

  /** Re-baseline cohort keys, in the order they appear in
    * BASELINE_BENCH.json (the round-1 "queries" map precedes all of
    * them). Appending a new round's cohort = add its key here and its
    * map at the END of the file. */
  private[graft] val CohortKeys = Seq("queries_r13", "queries_r14",
    "queries_r15", "queries_r15b")

  /** Slice BASELINE_BENCH text into (cohort, slice) pairs: the
    * round-1 baseline is everything before the first re-baseline key,
    * and each re-baseline's slice runs from its key to the NEXT key
    * (r14 fix: the old suffix-split would have merged every later
    * cohort into queries_r13's slice, silently corrupting its geomean
    * the moment a third cohort landed — BenchGuardSpec pins the
    * slicing). Regex parse only; no JSON library on the unmanaged
    * classpath. */
  private[graft] def cohortSlices(txt: String): Seq[(String, String)] = {
    val marks = CohortKeys.map(k => k -> txt.indexOf("\"" + k + "\""))
      .filter(_._2 >= 0).sortBy(_._2)
    val firstIdx = marks.headOption.map(_._2).getOrElse(txt.length)
    ("baseline" -> txt.substring(0, firstIdx)) +: marks.zipWithIndex.map {
      case ((k, i), j) =>
        val end = marks.lift(j + 1).map(_._2).getOrElse(txt.length)
        k -> txt.substring(i, end)
    }
  }

  /** BASELINE_BENCH.json carries the original round-1 "queries" map
    * (82-query continuity series) plus one full-surface re-baseline
    * per round since r13 (the r12 verdict's ask #6 — the shared
    * cohort had shrunk to 30% of the suite). Every cohort's geomean
    * is reported. */
  private def baselineCohorts(best: collection.Map[String, Double])
      : Map[String, (Double, Int)] = {
    val p = java.nio.file.Paths.get("BASELINE_BENCH.json")
    if (!java.nio.file.Files.exists(p)) return Map.empty
    cohortSlices(java.nio.file.Files.readString(p)).flatMap {
      case (k, slice) => geomeanOver(slice, best).map(k -> _)
    }.toMap
  }

  private def compactLine(best: collection.Map[String, Double],
                          errs: collection.Map[String, String],
                          total: Double, passes: Int, runsReq: Int,
                          sfDir: String, passSecs: Seq[Double] = Nil,
                          noiseBand: String = ""): String = {
    val gms = baselineCohorts(best)
    def gmPart(key: String, label: String, nLabel: String): String =
      gms.get(key).map { case (g, n) =>
        s""","$label":${math.rint(g * 1000) / 1000},"$nLabel":$n"""
      }.getOrElse("")
    val gmJson = gmPart("baseline", "geomean_vs_baseline", "shared_queries") +
      gmPart("queries_r13", "geomean_vs_r13", "shared_r13") +
      gmPart("queries_r14", "geomean_vs_r14", "shared_r14") +
      gmPart("queries_r15", "geomean_vs_r15", "shared_r15") +
      gmPart("queries_r15b", "geomean_vs_r15b", "shared_r15b")
    val passJson = if (passSecs.isEmpty) "" else
      passSecs.map(p => math.rint(p * 10) / 10).mkString(""","pass_secs":[""", ",", "]")
    val nbJson = if (noiseBand.isEmpty) "" else s""","noise_band":$noiseBand"""
    val out = s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","sf":"$sfDir","n_queries":${best.size},"n_errors":${errs.size},"passes":$passes,"runs_requested":$runsReq,"partial":false$gmJson$passJson$nbJson,"detail":"bench_last.json"}"""
    // Belt and braces: the whole point is fitting the driver's tail.
    if (out.length < 1900) out
    else s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","sf":"$sfDir","detail":"bench_last.json"}"""
  }
}
