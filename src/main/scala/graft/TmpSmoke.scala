package graft

object TmpSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = "/root/testdata/sf0.01"
    for (n <- Seq("mix1_domain_mixture", "sc1_scd2_history", "j5_bloom_prefilter",
        "a11_sketch_rollup", "k8_zorder_layout")) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sf)
      val rows = df.collect()
      println(s"SMOKE $n rows=${rows.length} t=${(System.nanoTime() - t0) / 1e9}")
      rows.take(3).foreach(r => println(s"  $r"))
    }
    spark.stop()
  }
}
