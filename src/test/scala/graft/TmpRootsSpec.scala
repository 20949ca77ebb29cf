package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM spec for the per-process scratch-root discipline — the
  * round-6 fix for cross-JVM scratch collisions (SURVEY §5). */
class TmpRootsSpec extends AnyFunSuite {

  private val tmpdir = Paths.get(sys.props("java.io.tmpdir"))
  private val pid = ProcessHandle.current().pid()

  test("perProcess embeds this pid and is stable across calls") {
    val a = TmpRoots.perProcess("graft_tmproots_spec")
    val b = TmpRoots.perProcess("graft_tmproots_spec")
    assert(a == b, "same prefix must map to the same root")
    assert(a.endsWith(s"graft_tmproots_spec_pid$pid"))
  }

  test("cleanStale removes dead-pid and legacy fixed-name roots, keeps live ones") {
    val prefix = "graft_tmproots_stale"
    // a "dead" sibling: no live pid is ever negative/absurdly large,
    // so pick one guaranteed unused (max pid on linux < 2^22 default)
    val dead = tmpdir.resolve(s"${prefix}_pid99999999")
    val legacy = tmpdir.resolve(prefix)
    val mine = Paths.get(TmpRoots.perProcess(prefix))
    Seq(dead, legacy, mine).foreach(Files.createDirectories(_))
    try {
      TmpRoots.cleanStale(prefix)
      assert(!Files.exists(dead), "dead-pid root must be swept")
      assert(!Files.exists(legacy), "pre-pid legacy root must be swept")
      assert(Files.exists(mine), "this process's root must survive")
    } finally Seq(dead, legacy, mine).foreach(TmpRoots.deleteTree)
  }

  test("cleanLegacy deletes only full-name regex matches") {
    val hit = tmpdir.resolve("graft_tmproots_legacy12345")
    val hitCkpt = tmpdir.resolve("graft_tmproots_legacy12345_ckpt")
    val miss = tmpdir.resolve("graft_tmproots_legacyKEEP")
    Seq(hit, hitCkpt, miss).foreach(Files.createDirectories(_))
    try {
      TmpRoots.cleanLegacy("graft_tmproots_legacy\\d+(_ckpt)?")
      assert(!Files.exists(hit) && !Files.exists(hitCkpt),
        "matching leftovers must be swept")
      assert(Files.exists(miss), "non-matching names must survive")
    } finally Seq(hit, hitCkpt, miss).foreach(TmpRoots.deleteTree)
  }

  test("deleteTree removes nested content and tolerates a missing root") {
    val root = tmpdir.resolve(s"graft_tmproots_del_$pid")
    Files.createDirectories(root.resolve("a/b"))
    Files.writeString(root.resolve("a/b/f.txt"), "x")
    TmpRoots.deleteTree(root)
    assert(!Files.exists(root))
    TmpRoots.deleteTree(root) // second call: no-op, must not throw
  }
}
