package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards for the bench tooling traps the r12 verdict named (ask #7):
  * the sf-mismatch clobber and the pass-level diagnosability of the
  * evidence file. Pure-function tests — no SparkSession.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("flushTarget: an sf mismatch diverts the write off bench_last.json") {
    val committed =
      """{"metric":"total","value":1.0,"unit":"sec","sf":"/root/testdata/sf0.1"}"""
    // same sf (or no committed evidence): the canonical target
    assert(Bench.flushTarget(None, "/root/testdata/sf0.1") == "bench_last.json")
    assert(Bench.flushTarget(Some(committed), "/root/testdata/sf0.1")
      == "bench_last.json")
    // a different-sf capture must NOT overwrite the sealed evidence
    assert(Bench.flushTarget(Some(committed), "/root/testdata/sf0.01")
      == "bench_last.sf0.01.json")
    assert(Bench.flushTarget(Some(committed), "/root/testdata/sf1")
      == "bench_last.sf1.json")
    // unparseable committed file (no sf field): fail open to the
    // canonical target rather than wedging the bench
    assert(Bench.flushTarget(Some("{}"), "/root/testdata/sf0.01")
      == "bench_last.json")
  }
}
