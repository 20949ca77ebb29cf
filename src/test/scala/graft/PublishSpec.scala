package graft

import graft.sources.AtomicPublish
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Atomic multi-output publish (VERDICT r2, Missing #3): a pipeline's
  * corpus + stats must flip together or not at all, like the
  * reference's BEGIN TRANSACTION/COMMIT around multi-table writes
  * (db.mjs:467-471).
  */
class PublishSpec extends GraftSpec {

  private def corpusOf(tag: String) = {
    import spark.implicits._
    Seq((1L, s"doc one $tag"), (2L, s"doc two $tag"), (3L, s"doc three $tag"))
      .toDF("doc_id", "text")
  }

  private def statsOf(tag: String) =
    corpusOf(tag).agg(count(lit(1)).as("n_docs"), lit(tag).as("build_tag"))

  private def readPair(root: String): (Seq[String], String) = (
    AtomicPublish.readOutput(spark, root, "corpus")
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq,
    AtomicPublish.readOutput(spark, root, "stats").collect().head.getString(1))

  test("both outputs flip together; a crash between writes leaves the old pair visible") {
    val root = Files.createTempDirectory(Files.createDirectories(java.nio.file.Paths.get(graft.TmpRoots.perProcess("graft_publish_spec"))), "p1_").toString
    assert(AtomicPublish.currentVersion(spark, root).isEmpty)

    val v1 = AtomicPublish.publish(spark, root,
      Seq("corpus" -> corpusOf("r1"), "stats" -> statsOf("r1")))
    assert(v1 == "v1")
    val (c1, s1) = readPair(root)
    assert(c1.forall(_.endsWith("r1")) && s1 == "r1")

    // CRASH WINDOW: version 2's corpus is staged, then the process
    // "dies" before the stats write and the pointer swap. Readers must
    // still see the complete, consistent r1 pair.
    AtomicPublish.stage(spark, root, "v2", "corpus", corpusOf("r2"))
    val (cMid, sMid) = readPair(root)
    assert(cMid.forall(_.endsWith("r1")) && sMid == "r1",
      "readers observed a half-published version")

    // recovery publishes a fresh version: both outputs flip at once
    val v2 = AtomicPublish.publish(spark, root,
      Seq("corpus" -> corpusOf("r2"), "stats" -> statsOf("r2")))
    val (c2, s2) = readPair(root)
    assert(c2.forall(_.endsWith("r2")) && s2 == "r2",
      s"expected the r2 pair after commit, got ($c2, $s2)")

    // vacuum drops the aborted staging and the superseded v1, keeps v2
    AtomicPublish.vacuum(spark, root)
    val left = new java.io.File(s"$root/versions").listFiles().map(_.getName).toSet
    assert(left == Set(v2), s"vacuum left $left")
    val (c3, s3) = readPair(root)
    assert(c3.forall(_.endsWith("r2")) && s3 == "r2")
  }

  test("a crash after staging ALL outputs but before the pointer swap is invisible") {
    val root = Files.createTempDirectory(Files.createDirectories(java.nio.file.Paths.get(graft.TmpRoots.perProcess("graft_publish_spec"))), "p2_").toString
    AtomicPublish.publish(spark, root,
      Seq("corpus" -> corpusOf("a"), "stats" -> statsOf("a")))
    AtomicPublish.stage(spark, root, "v2", "corpus", corpusOf("b"))
    AtomicPublish.stage(spark, root, "v2", "stats", statsOf("b"))
    // no commit — the swap never happened
    val (c, s) = readPair(root)
    assert(c.forall(_.endsWith("a")) && s == "a")
    assert(AtomicPublish.currentVersion(spark, root).contains("v1"))
  }

  test("time travel: superseded versions read back unchanged; vacuum keepLast is the horizon") {
    val root = Files.createTempDirectory(Files.createDirectories(java.nio.file.Paths.get(graft.TmpRoots.perProcess("graft_publish_spec"))), "tt_").toString
    AtomicPublish.publish(spark, root, Seq("corpus" -> corpusOf("old")))
    AtomicPublish.publish(spark, root, Seq("corpus" -> corpusOf("new")))
    // the v2 commit must not disturb the retained v1 bytes
    val v1 = AtomicPublish.readOutputAt(spark, root, "v1", "corpus")
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(v1.forall(_.endsWith("old")), s"time-travel read returned $v1")
    assert(AtomicPublish.readOutput(spark, root, "corpus")
      .collect().forall(_.getString(1).endsWith("new")))

    // keepLast=2 retains the time-travel horizon
    AtomicPublish.vacuum(spark, root, keepLast = 2)
    val left2 = new java.io.File(s"$root/versions").listFiles().map(_.getName).toSet
    assert(left2 == Set("v1", "v2"), s"keepLast=2 left $left2")
    assert(AtomicPublish.readOutputAt(spark, root, "v1", "corpus").count() == 3)

    // keepLast=1 collapses to current-only: v1 is gone, v2 intact
    AtomicPublish.vacuum(spark, root, keepLast = 1)
    val left1 = new java.io.File(s"$root/versions").listFiles().map(_.getName).toSet
    assert(left1 == Set("v2"), s"keepLast=1 left $left1")
    assert(intercept[Exception] {
      AtomicPublish.readOutputAt(spark, root, "v1", "corpus").count()
    } != null)
  }
}
