package graft
import org.apache.spark.sql.SparkSession
/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  * Queries are materialized with a noop-format write so every output
  * column is computed (a bare count() would let Catalyst prune the
  * projections being measured). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    // warm up the JVM/scheduler/file-system paths once so the first
    // measured query doesn't absorb session start-up cost
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1).collect()
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // min over N INTERLEAVED passes of the whole suite
    // (SPARK_GRAFT_RUNS, default 4). Two reasons for min-of-N: later
    // passes measure steady-state (code already JIT'd/codegen-cached),
    // and the min rejects transient host stalls. The passes are
    // interleaved (suite × N, not query × N back-to-back) because the
    // stalls observed on this VM are BURSTY — a busy window lasting
    // tens of seconds inflates every back-to-back attempt of the
    // queries inside it, while under interleaving the same window
    // hits a different stretch of the suite each pass and the
    // per-query min survives. SPARK_GRAFT_ONLY=q1,q2 restricts to a
    // subset. A query that throws must NOT silently bench as "fast":
    // its error is recorded and surfaces in the output line.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "4").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val best = scala.collection.mutable.Map.empty[String, Double]
    val errs0 = scala.collection.mutable.Map.empty[String, String]
    for (_ <- 1 to runs; (name, fn) <- queries) {
      val t0 = System.nanoTime()
      try run(fn) catch {
        case e: Throwable => errs0.getOrElseUpdate(name,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      best.updateWith(name)(v => Some(v.fold(dt)(math.min(_, dt))))
    }
    val results = queries.map { case (name, _) =>
      (name, best(name), errs0.get(name))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_errors":${results.count(_._3.isDefined)},"sf":"$sfDir"}"""
    println(line)
    // Persist the same line: stdout captures have been truncated by the
    // driver's tail before (round 3 lost its first ~30 queries), and a
    // bench whose evidence evaporates can't prove the absence of
    // regressions. bench_last.json in the repo root is the durable copy.
    // (subset runs don't clobber the durable full-suite evidence)
    if (only.isEmpty)
      java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_last.json"), line + "\n")
    spark.stop()
  }
}
