package graft

/** Child-JVM probe for the catalog-persistence spec: each invocation
  * is a genuinely fresh process (fresh SparkContext, fresh Derby
  * connection) against the metastore directory passed in argv — the
  * closest a test can get to "stop the engine, start it again".
  * Modes: `create` writes a managed table and exits; `read` reopens
  * the SAME metastore and must find the table via `spark.table`.
  * Exit code 0 = success (the spec asserts on it).
  */
object PersistenceProbe {

  val TableName = "graft_persist_roundtrip"
  val BucketedName = "graft_persist_bucketed"

  def main(args: Array[String]): Unit = {
    val Array(mode, stateDir) = args
    val s = GraftSession.builder(cores = 2, stateDir = stateDir)
      .appName(s"graft-persist-$mode").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      mode match {
        case "create" =>
          import s.implicits._
          Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
            .toDF("id", "k", "v")
            .write.mode("overwrite").format("parquet")
            .saveAsTable(TableName)
          // bucketed layout: the metadata that made k2's join
          // 0-Exchange must survive the restart too
          Seq((1L, 100.0), (2L, 200.0), (3L, 300.0))
            .toDF("id", "amount")
            .write.mode("overwrite")
            .bucketBy(4, "id").sortBy("id")
            .saveAsTable(BucketedName)
        case "read" =>
          val rows = s.table(TableName).collect()
          println(s"[probe] rows=${rows.length}")
          if (rows.length != 3 || rows.map(_.getLong(0)).sorted.toSeq != Seq(1L, 2L, 3L))
            sys.exit(3)
          // the reopened catalog must still know the bucket spec: a
          // sort-merge self-join on the bucket key plans with ZERO
          // shuffle Exchange (broadcast is suppressed via the merge
          // hint so the bucketing is what's exercised)
          val b = s.table(BucketedName)
          val joined = b.as("x").hint("merge").join(b.as("y"), "id")
          val plan = joined.queryExecution.executedPlan.toString
          val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
          println(s"[probe] bucketed_join_shuffles=$shuffles")
          if (shuffles != 0) sys.exit(4)
          if (joined.count() != 3) sys.exit(5)
      }
    } finally s.stop()
  }
}
