package graft

/** Child-JVM probe for the two-process build-fence race
  * (FenceRaceSpec): both probes target the SAME DurableIndex root,
  * spin on a barrier file so they reach `ensure` together, and the
  * build body sleeps inside the fence to widen the race window. Exit
  * codes encode the outcome for the parent: 10 = this process BUILT
  * the index, 20 = this process blocked on the cross-process file
  * lock and then REUSED the winner's committed version; 3 = more
  * than one version ended up committed (fence broken); other
  * non-zero = infrastructure failure.
  */
object FenceRaceProbe {

  def main(args: Array[String]): Unit = {
    val Array(root, stateDir, who, barrier) = args
    val s = GraftSession.builder(cores = 2, stateDir = stateDir)
      .appName(s"graft-fence-$who").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (!java.nio.file.Files.exists(java.nio.file.Paths.get(barrier))) {
        if (System.currentTimeMillis() > deadline) sys.exit(7)
        Thread.sleep(5)
      }
      var built = false
      graft.sources.DurableIndex.ensure(s, root) {
        built = true
        Thread.sleep(1500) // hold the lock: the peer must BLOCK here
        import s.implicits._
        graft.sources.AtomicPublish.publish(s, root,
          Seq("payload" -> Seq((who, 1L)).toDF("builder", "one")))
      }
      val ver = graft.sources.AtomicPublish.currentVersion(s, root)
        .getOrElse("none")
      val sawBuilder = s.read.parquet(s"$root/versions/$ver/payload")
        .collect()(0).getString(0)
      println(s"[fence] who=$who built=$built version=$ver builder=$sawBuilder")
      if (ver != "v1") sys.exit(3)
      if (!built && sawBuilder == who) sys.exit(4) // reused but payload claims us?
      sys.exit(if (built) 10 else 20)
    } finally s.stop()
  }
}
