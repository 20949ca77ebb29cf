package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards for the bench tooling traps the r12 verdict named (ask #7):
  * the sf-mismatch clobber and the pass-level diagnosability of the
  * evidence file. Pure-function tests — no SparkSession.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("flushTarget: a non-reference sf diverts the write off bench_last.json") {
    // reference sf: the canonical target
    assert(Bench.flushTarget("/root/testdata/sf0.1") == "bench_last.json")
    // any other sf must NOT overwrite the sealed evidence — keyed on
    // the pinned reference constant, NOT on the committed file's
    // self-declared sf (r13 advice #5: that guard failed open when
    // the file was missing/unparseable, so one bad overwrite would
    // permanently re-aim it)
    assert(Bench.flushTarget("/root/testdata/sf0.01")
      == "bench_last.sf0.01.json")
    assert(Bench.flushTarget("/root/testdata/sf1") == "bench_last.sf1.json")
    // a trailing path separator no longer yields "bench_last..json"
    assert(Bench.flushTarget("/root/testdata/sf0.1/") == "bench_last.json")
    assert(Bench.flushTarget("/root/testdata/sf1///")
      == "bench_last.sf1.json")
    // a deliberate re-baseline goes through the refSf parameter (env
    // override in production), never through a mutable committed file
    assert(Bench.flushTarget("/root/testdata/sf1", refSf = "sf1")
      == "bench_last.json")
    assert(Bench.flushTarget("/root/testdata/sf0.1", refSf = "sf1")
      == "bench_last.sf0.1.json")
  }
}
