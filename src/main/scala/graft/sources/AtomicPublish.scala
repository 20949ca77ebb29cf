package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** All-or-nothing publication of MULTIPLE outputs — the reference
  * wraps its multi-table cleanup in BEGIN TRANSACTION/COMMIT
  * (hive-backend db.mjs:467-471); a pipeline writing corpus + index +
  * stats needs the same guarantee on plain parquet (no table-format
  * jars in this build). The classic staging-dir + last-good-pointer
  * pattern:
  *
  *  - every output of version N is written under
  *    `<root>/versions/vN/<output>/` (staging: invisible to readers,
  *    whatever partial state a crash leaves there is inert garbage);
  *  - the `LATEST` pointer file names the committed version; readers
  *    resolve it FIRST and then read only that version's outputs, so
  *    a consistent pair is always visible;
  *  - commit is ONE atomic pointer swap: write `LATEST.tmp`, then
  *    `FileContext.rename(..., OVERWRITE)` — atomic on HDFS and posix
  *    filesystems (on S3-style stores the same role is played by a
  *    conditional PUT of the pointer object).
  *
  * A crash between output writes, or after all writes but before the
  * swap, leaves readers on the old version with BOTH outputs
  * consistent — asserted by PublishSpec's crash-window test.
  * [[vacuum]] is the transaction-log GC: it drops every version
  * directory except the committed one (aborted stagings and
  * superseded versions alike).
  */
object AtomicPublish {

  private val Pointer = "LATEST"

  private def fc(s: SparkSession, root: String): FileContext =
    FileContext.getFileContext(new Path(root).toUri, s.sparkContext.hadoopConfiguration)

  /** The committed version name, if any publish ever completed. */
  def currentVersion(s: SparkSession, root: String): Option[String] = {
    val ctx = fc(s, root)
    val p = new Path(s"$root/$Pointer")
    if (!ctx.util.exists(p)) None
    else {
      val in = ctx.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim)
      } finally in.close()
    }
  }

  /** Committed version as a number; a corrupted/unparseable pointer is
    * treated as no-commit rather than thrown on, so a damaged pointer
    * file degrades to "republish from v1" instead of wedging every
    * caller (publish, vacuum, diff) on a NumberFormatException. */
  private def currentVersionNum(s: SparkSession, root: String): Option[Long] =
    currentVersion(s, root).flatMap(_.stripPrefix("v").toLongOption)

  private def nextVersion(s: SparkSession, root: String): String =
    "v" + (currentVersionNum(s, root).getOrElse(0L) + 1)

  /** Stage one output of an uncommitted version (invisible until
    * [[commit]]). */
  def stage(s: SparkSession, root: String, version: String,
      name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/versions/$version/$name")

  /** Atomically flip readers to `version`: tmp-file write + overwrite
    * rename of the pointer. Everything before this call is invisible;
    * everything after it is the new consistent set. */
  def commit(s: SparkSession, root: String, version: String): Unit = {
    val ctx = fc(s, root)
    val tmp = new Path(s"$root/$Pointer.tmp")
    val dst = new Path(s"$root/$Pointer")
    val out = ctx.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(version.getBytes("UTF-8")) finally out.close()
    ctx.rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  /** Publish all outputs as one transaction: stage every DataFrame
    * under the next version, then one atomic pointer swap. Returns
    * the committed version. */
  def publish(s: SparkSession, root: String,
      outputs: Seq[(String, DataFrame)]): String = {
    val v = nextVersion(s, root)
    outputs.foreach { case (name, df) => stage(s, root, v, name, df) }
    commit(s, root, v)
    v
  }

  /** Read one output of the COMMITTED version — never a staging dir. */
  def readOutput(s: SparkSession, root: String, name: String): DataFrame = {
    val v = currentVersion(s, root).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    s.read.parquet(s"$root/versions/$v/$name")
  }

  /** TIME TRAVEL: read one output of a specific RETAINED version (≤
    * the committed one and not yet vacuumed) — immutable version dirs
    * mean a historical read needs no locks and never blocks writers.
    * The caller names the version (from its own ledger or
    * [[currentVersion]] arithmetic); reading a vacuumed or
    * never-committed version fails on the missing path. */
  def readOutputAt(s: SparkSession, root: String, version: String,
      name: String): DataFrame =
    s.read.parquet(s"$root/versions/$version/$name")

  /** GC with a retention window: keep the `keepLast` most recent
    * COMMITTED versions (time-travel horizon); drop everything else —
    * older versions, aborted stagings (crash garbage), and staged-
    * but-never-committed dirs above the pointer. keepLast = 1 is the
    * classic "current only" vacuum; keepLast < 1 is rejected because
    * it would delete the version LATEST points at.
    *
    * SINGLE-WRITER assumption (same as the reference's one SQLite
    * writer, db.mjs:17): vacuum treats any dir above the pointer as
    * crash garbage, so it must never run concurrently with another
    * process's in-flight publish — that publish's staging dir would be
    * deleted just before its commit flips the pointer to a missing
    * path. graft's callers satisfy this (per-process roots,
    * TmpRoots.scala); a multi-writer deployment would need a
    * commit-time grace window or a lease on the root. */
  def vacuum(s: SparkSession, root: String, keepLast: Int = 1): Unit = {
    require(keepLast >= 1,
      s"vacuum(keepLast=$keepLast) would delete the committed version")
    val cur = currentVersionNum(s, root)
    val versions = new Path(s"$root/versions")
    val fs = versions.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(versions)) fs.listStatus(versions).foreach { st =>
      val keep = cur.exists { c =>
        val n = st.getPath.getName.stripPrefix("v").toLongOption
        n.exists(v => v <= c && v > c - keepLast)
      }
      if (!keep) fs.delete(st.getPath, true)
    }
  }
}
