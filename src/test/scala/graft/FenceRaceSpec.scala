package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** r14 ask #6: the DurableIndex build fence is claimed as the
  * single-node analog of a cluster build lease, but until this spec
  * it was only ever exercised inside ONE JVM (where the in-process
  * monitor serializes and the OS file lock is never contended).
  * This races two GENUINE processes at the same root: both spin on a
  * barrier file, call `ensure` together, and the build body holds
  * the lock for 1.5 s — if the FileChannel lock did not serialize
  * cross-process, both would build and the second publish would
  * commit v2. Asserts: exactly one process built, the loser blocked
  * and then reused the winner's version, exactly ONE committed
  * version (v1) exists, and nothing else (no staging garbage, no
  * extra version dirs) survives under the root.
  */
class FenceRaceSpec extends AnyFunSuite {

  private def launch(root: String, stateDir: String, who: String,
      barrier: String): Process = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cp = sys.props("java.class.path")
    val moduleFlags = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val cmd = Seq(javaBin) ++ moduleFlags ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", cp, "graft.FenceRaceProbe", root, stateDir, who, barrier)
    new ProcessBuilder(cmd: _*).inheritIO().start()
  }

  test("two JVMs racing one DurableIndex root: exactly one builds, the loser reuses, one version survives") {
    val scratch = Files.createDirectories(
      java.nio.file.Paths.get(TmpRoots.perProcess("graft_fence_race")))
    val root = Files.createTempDirectory(scratch, "root_").toString + "/idx"
    val barrier = s"$root.barrier"
    val pA = launch(root, Files.createTempDirectory(scratch, "sA_").toString,
      "A", barrier)
    val pB = launch(root, Files.createTempDirectory(scratch, "sB_").toString,
      "B", barrier)
    // give both JVMs time to reach the spin loop, then drop the flag
    Thread.sleep(8000)
    Files.createFile(java.nio.file.Paths.get(barrier))
    assert(pA.waitFor(300, TimeUnit.SECONDS), "probe A timed out")
    assert(pB.waitFor(300, TimeUnit.SECONDS), "probe B timed out")
    val codes = Seq(pA.exitValue(), pB.exitValue()).sorted
    assert(codes == Seq(10, 20),
      s"expected exactly one builder (10) and one reuser (20), got $codes")
    // exactly one committed version and no staging garbage on disk
    val versions = Files.list(java.nio.file.Paths.get(s"$root/versions"))
    val dirs = try versions.iterator().asScala.map(_.getFileName.toString).toSeq
      finally versions.close()
    assert(dirs == Seq("v1"), s"stale siblings survived the race: $dirs")
    val pointer = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/LATEST")), "UTF-8").trim
    assert(pointer == "v1")
  }
}
