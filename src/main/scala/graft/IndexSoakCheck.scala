package graft

/** One-shot scale-evidence capture for the index-maintenance soak
  * (r14 ask #5): runs [[graft.streaming.StreamingSoak.indexSoak]] —
  * d13's applyBatch under a real file-source stream — over
  * `args(0)`'s documents table and prints ONE JSON line for the
  * SCALECHECK artifact. Usage:
  * `runMain graft.IndexSoakCheck /root/testdata/sf0.1`. */
object IndexSoakCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    try {
      val work = java.nio.file.Files
        .createTempDirectory("graft_soak_idx_check").toString
      val r = graft.streaming.StreamingSoak.indexSoak(spark, dir, work)
      println(
        s"""{"check":"index_soak","dir":"$dir","batches":${r.batches},""" +
        s""""seconds":${math.round(r.seconds * 100) / 100.0},""" +
        s""""docs_streamed":${r.docsStreamed},"versions":${r.versions},""" +
        s""""span_occ_rows":${r.spanOccRows},""" +
        s""""index_rows_final":${r.indexRowsFinal},""" +
        s""""matched":${r.matched}}""")
    } finally spark.stop()
  }
}
