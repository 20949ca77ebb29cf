package graft

import org.apache.spark.sql.execution.ExplainMode

/** Per-query formatted-plan dumper for the optimization rounds'
  * before/after evidence (plans/rNN/<query>_<tag>.txt):
  *
  * {{{
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <tag> q1,q2,..."
  * }}}
  *
  * Each named SparkEntry query's `.explain("formatted")` text is
  * written to `<outDir>/<name>_<tag>.txt`. Plans only — nothing is
  * executed, so index-build side effects don't fire unless plan
  * CONSTRUCTION itself requires a committed artifact (those builders
  * run exactly as they would before a real run).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    new java.io.File(outDir).mkdirs()
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty)
    val qs = SparkEntry.queries
    wanted.foreach { name =>
      qs.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val plan = fn(spark, sfDir).queryExecution
              .explainString(ExplainMode.fromString("formatted"))
            val w = new java.io.PrintWriter(s"$outDir/${name}_$tag.txt", "UTF-8")
            try w.write(plan) finally w.close()
            println(s"[plandump] wrote $outDir/${name}_$tag.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
