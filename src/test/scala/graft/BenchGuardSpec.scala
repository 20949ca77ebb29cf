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

  test("cohortSlices: each re-baseline cohort is sliced to ITS map, not the file suffix") {
    val txt =
      """{"note":"x","queries":{"q1":1.0,"q2":2.0},
        |"queries_r13":{"q1":0.9,"q2":1.8,"q3":3.0},
        |"queries_r14":{"q1":0.8,"q2":1.6,"q3":2.5,"q4":4.0}}""".stripMargin
    val slices = Bench.cohortSlices(txt).toMap
    // the round-1 slice ends where the first re-baseline begins
    assert(slices("baseline").contains("\"q1\":1.0")
      && !slices("baseline").contains("queries_r13"))
    // r13's slice must NOT absorb r14's pairs (the suffix-split bug
    // this replaces: q1 would have resolved to 0.8, not 0.9)
    assert(slices("queries_r13").contains("\"q1\":0.9")
      && !slices("queries_r13").contains("\"q1\":0.8"))
    assert(slices("queries_r14").contains("\"q4\":4.0"))
    // a file without the r14 cohort degrades gracefully
    val old = Bench.cohortSlices(
      """{"queries":{"q1":1.0},"queries_r13":{"q1":0.9}}""").toMap
    assert(old.keySet == Set("baseline", "queries_r13"))
  }

  test("noise_band: per-query repeatability ratios + steady-pass spread (r14 ask #8)") {
    // q1 perfectly repeatable (ratio 1.0), q2 noisy (2nd-min/min =
    // 1.5), q3 single-sample (excluded), q4 wild outlier in a LATER
    // sample (min-of-N immune: ratio uses 2nd-smallest, = 1.2)
    val samples = Map(
      "q1" -> Seq(1.0, 1.0, 1.0),
      "q2" -> Seq(3.0, 2.0, 5.0),
      "q3" -> Seq(5.0),
      "q4" -> Seq(1.0, 9.0, 1.2))
    // pass 1 carries index builds and must be excluded from the spread
    val nb = Bench.noiseBandJson(samples, Seq(200.0, 150.0, 165.0))
    assert(nb.contains(""""per_query_p50":1.2"""), nb)
    assert(nb.contains(""""per_query_p90":1.5"""), nb)
    assert(nb.contains(""""pass_spread":1.1"""), nb) // 165/150, not 200/150
    assert(nb.contains(""""n":3"""), nb)
    // degenerate inputs stay well-formed
    assert(Bench.noiseBandJson(Map.empty, Nil)
      .contains(""""per_query_p50":1.0"""))
  }
}
