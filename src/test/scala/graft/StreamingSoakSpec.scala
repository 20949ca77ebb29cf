package graft

import graft.streaming.StreamingSoak

/** Streaming scale evidence (SURVEY §2 streaming rows + §5): the
  * composed stateful pipeline — stream-stream interval join feeding a
  * sliding-window aggregation — soaked over the REAL sf0.1 events
  * table as a many-file file-source stream under Trigger.AvailableNow,
  * asserting stream ≡ batch and that the run actually spanned many
  * micro-batches (state carried across triggers, not one big batch).
  * The MemoryStream specs prove operator semantics on small planted
  * frames; this proves the same plans hold when 100k real rows flow
  * through checkpointed state — the streaming analog of SCALECHECK.
  */
class StreamingSoakSpec extends GraftSpec {

  test("sf0.1 file-source soak: join→window pipeline streams ≡ batch across micro-batches") {
    val work = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val r = StreamingSoak.run(spark, "/root/testdata/sf0.1", work)
    assert(r.matched, s"stream result != batch result: $r")
    assert(r.batches >= 8, s"expected a many-micro-batch soak, got: $r")
    assert(r.inputRows >= 100000L, s"soak did not consume the corpus: $r")
    assert(r.outputRows > 0)
    // bounded-state claim: join+window state stays horizon-sized (a
    // generous ceiling far below input size proves it didn't grow with
    // the stream)
    assert(r.stateRowsMax < r.inputRows / 10,
      s"state grew with the stream, not the horizon: $r")
  }

  test("sf0.1 index-maintenance soak: applyBatch under a real file stream, increment ≡ rebuild") {
    // r14 ask #5: the d13 family's foreachBatch endpoint was only
    // chained-MemoryStream-spec'd; this drives it with 4000 real
    // documents arriving as 16 files, 2 per trigger — 8 micro-batches
    // each publishing version N+1 through the exactly-once ledger —
    // and requires every committed output to equal a from-scratch
    // rebuild of the whole family over the full corpus.
    val work = java.nio.file.Files.createTempDirectory("graft_soak_idx").toString
    val r = StreamingSoak.indexSoak(spark, "/root/testdata/sf0.1", work)
    assert(r.matched, s"incremental snapshot != rebuild: $r")
    assert(r.batches >= 8, s"expected a many-micro-batch soak: $r")
    assert(r.versions >= 9, s"v1 + >=8 increments expected: $r")
    assert(r.docsStreamed >= 3500, s"soak did not stream the corpus: $r")
    assert(r.spanOccRows > 100000L,
      s"span plane did not accumulate through the stream: $r")
  }
}
