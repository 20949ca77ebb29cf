package graft

import graft.operators.{Analytics, Dedup, Relational, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode

/** Regenerates EXPLAIN.md from the live plans of the flagship queries
  * (run after any plan-shape change):
  *
  * {{{ sbt "runMain graft.ExplainDump" }}}
  *
  * PlanAuditSpec asserts the key properties of these same plans, so
  * the document and CI cannot drift apart silently.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("EXPLAIN.md")
    val spark = GraftSession.local(8)
    val flagship: Seq[(String, String, (SparkSession, String) => DataFrame)] = Seq(
      ("r1_filtered_scan", "filter + projection pushdown to the parquet scan",
        Relational.r1FilteredScan _),
      ("q5_region_revenue", "bounded dims (region⋈nation) broadcast by hint; sf-linear dims planner-chosen (r13 de-hint) — still BroadcastHashJoin here, lineitem⋈orders the only shuffle join",
        Analytics.q5RegionRevenue _),
      ("d18_exact_spans", "exact arbitrary-alignment span mask as a read path over the published duplication-mass span index — no gram re-sweep, no xxhash64 in the plan",
        Dedup.d18ExactSpans _),
      ("d19_span_extents", "maximal duplicated-span extents: gaps-and-islands over committed masked starts — pure index read, the corpus appears nowhere",
        Dedup.d19SpanExtents _),
      ("obt2_write_frame", "the production OBT materialization's pre-write frame: hash fan-out on (region, orderkey slice) + sortWithinPartitions — no rangepartitioning exchange, zero global Sort",
        (s: SparkSession, d: String) => graft.sources.Sources.obt2WriteFrame(s, d)),
      ("t31_span_decontaminate", "span-grain eval decontamination: eval gram-hash set broadcasts, train gram stream probes it with a semi-join and never shuffles",
        TextAnalysis.t31SpanDecontaminate _),
      ("d2_ngram_jaccard", "read-path filter over the shingle index's committed overlaps table — no kernel scan, no sh-exchange, no join (the build owns the DF-capped equi-join)",
        Dedup.d2NgramJaccard _),
      ("d3_minhash_lsh", "native MinHash32 kernel signatures (zero-shuffle scan+project); band-key equi-join candidates",
        Dedup.d3MinhashLsh _),
      ("d4_simhash", "native SimHash64 kernel signatures (zero-shuffle scan+project); hamming-chunk equi-join candidates",
        Dedup.d4Simhash _),
      ("d5_embedding_neardup", "read-path filter over the ANN index's committed neardup_edges table (the build owns the triangle-inequality-pruned cell equi-join — no corpus BNLJ)",
        Dedup.d5EmbeddingNeardup _),
      ("k2_bucketed_join", "bucketed managed tables: SortMergeJoin with no Exchange below it",
        (s: SparkSession, d: String) => graft.sources.Sources.k2BucketedJoin(s, d)),
      ("j2_asof_join", "as-of via union + carry-forward window: one shuffle on the key",
        Analytics.j2AsofJoin _),
      ("n3_ivf_ann", "zero-shuffle per-row cell argmax over literal centroids; corpus unshuffled until the probe join",
        Similarity.n3IvfAnn _),
      ("n5_centroids", "native VectorSumAgg: one pass, map-side combine, no dim-explode",
        Similarity.n5Centroids _),
      ("t15_decontaminate", "eval-holdout shingles broadcast; corpus unshuffled until the per-doc aggregate",
        TextAnalysis.t15Decontaminate _),
      ("s5_reservoir_sample", "hash-threshold pre-filter below the per-group window (no corpus-wide per-group sort)",
        Analytics.s5ReservoirSample _),
      ("n6_semantic_dedup", "zero-shuffle cell assignment; pairwise cosine only within cells (equi-join on cell_id)",
        Similarity.n6SemanticDedup _),
      ("n2_ann_lsh", "corpus pays 6 tables × 1 bucket; multiprobe expansion rides the broadcast query side",
        Similarity.n2AnnLsh _),
      ("n8_quantized_topk", "candidate scoring on int8 codes via the DotI8 integer kernel; float vectors only touched for the rerank survivors",
        Similarity.n8QuantizedTopk _),
      ("q7_nation_volume", "nation-tagged dims broadcast pre-filtered; lineitem⋈orders the only shuffle join",
        Analytics.q7NationVolume _),
      ("q6_revenue_delta", "pushdown showcase: all three predicates in PushedFilters, 4-column ReadSchema, partial agg to one row",
        Analytics.q6RevenueDelta _),
      ("q19_disjunctive_join", "part broadcasts with its conjunct supersets pre-pushed; the OR evaluates post-join, never a nested loop",
        Analytics.q19DisjunctiveJoin _),
      ("w5_sliding_window", "4-windows-per-event expansion stays map-side; ONE shuffle on window start serves count + distinct",
        Analytics.w5SlidingWindow _),
      ("q20_excess_shippers", "aggregate-subquery semi-join on ONE fact scan: per-part total via window over the aggregated view, LeftSemi supplier probe",
        Analytics.q20ExcessShippers _),
      ("q11_important_stock", "share-of-global-total HAVING: broadcast 1-row total over the per-part aggregate (shuffle shared via AQE reuse), threshold multiplied through decimals",
        Analytics.q11ImportantStock _),
      ("prof1b_approx_profile", "multi-column NDV via HLL sketches: one scan, NO Expand (contrast prof1's exact-NDV ×cols Expand)",
        graft.operators.Profiling.prof1bApproxProfile _),
      ("obt1_denormalize", "One Big Table star join: six broadcasts, orders the only shuffle join, one fact scan",
        Analytics.obt1Denormalize _),
      ("t20_bigram_perplexity", "bigram LM: kernel in-row (doc,bigram,tf); count table joins on its own key; unigram/V broadcast",
        TextAnalysis.t20BigramPerplexity _),
      ("b1_basket_pairs", "reads the committed basket index's pair supports (build: in-row pairs from per-order sorted sets); decode + TakeOrderedAndProject only",
        graft.operators.Mining.b1BasketPairs _),
      ("ts1_gap_fill", "spine from ONE 1-row aggregate double-exploded (span + type set); left join over bounded metadata",
        graft.operators.TimeSeries.ts1GapFill _),
      ("er1_fuzzy_match", "blocked levenshtein on the DISTINCT-name catalog: aggregates below the candidate equi-join, length prune rides the condition",
        graft.operators.EntityResolution.er1FuzzyMatch _),
      ("sky1_pareto_front", "skyline as one brand-partitioned window over the per-(brand,price) aggregate — no NOT-EXISTS self-join",
        graft.operators.Mining.sky1ParetoFront _),
      ("g3_triangle_count", "degree-oriented wedge join + closure equi-join; support-thresholded edges from in-row pair generation",
        graft.operators.Graph.g3TriangleCount _),
      ("n12_pq_topk", "PQ-ADC serving over the COMMITTED pq_codes/pq_books tables (r14: train-once/encode-once at ingest); per-query LUT lookups score candidates, exact rerank of 8k survivors",
        Similarity.n12PqTopk _),
      ("d21_span_scrub", "span removal: committed span-index read -> per-doc islands -> ONE doc-keyed join -> row-local slice fold excision; no per-token explode",
        Dedup.d21SpanScrub _),
      ("t32_decontaminate_scrub", "decontamination scrub: eval gram set broadcasts, train grams probe map-side, d21's row-local excision emits the clean corpus",
        TextAnalysis.t32DecontaminateScrub _),
      ("d22_incremental_scrub", "batch span scrub: committed-snapshot mask (d20's read path) + batch-text-only excision - the corpus is never rescanned",
        (s: SparkSession, d: String) => graft.operators.Incremental.d22IncrementalScrub(s, d)),
      ("d23_span_hotspots", "duplication hotspots: TakeOrdered over duplication-mass-bounded span_stats on a hash-independent total order; only the K winners touch text",
        (s: SparkSession, d: String) => graft.operators.Incremental.d23SpanHotspots(s, d)),
      ("prof11_depth_histogram", "equi-depth histogram: data-proportional grouped-rank fan-out, native binary-search bucket assignment, localCheckpoint-pinned sketch cuts, no Expand",
        graft.operators.Profiling.prof11DepthHistogram _),
      ("w7_stickiness", "rolling distinct via day-bin explode of the deduped (user,day) frame — raw events never fan out",
        Analytics.w7Stickiness _),
      ("g4_link_predict", "reads the committed (corpus, hub-cap) supplier-pair table; degree joins keyed over the pair-sized frame; TakeOrderedAndProject top-K",
        graft.operators.Graph.g4LinkPredict _),
      ("m5_phash_neardup", "pHash candidates ride the (band, value) equi-join with hot buckets capped; exact hamming fold on survivors only",
        (s: SparkSession, d: String) => graft.operators.Multimodal.m5PhashNeardup(s, d)),
      ("t22_zipf_profile", "rank window consumes the TakeOrdered top-1000 head, never the vocabulary-sized term frame; stats attach by broadcast",
        TextAnalysis.t22ZipfProfile _),
      ("e9_common_paths", "sessions from a user-partitioned window; journey n-grams generate in-row; one path-keyed count",
        Analytics.e9CommonPaths _),
      ("prof4_join_cardinality", "join-size audit as a key-domain equi-join of count AGGREGATES — never a row-grain join; totals broadcast",
        graft.operators.Profiling.prof4JoinCardinality _),
      ("d10_canonical_pick", "consumes the PUBLISHED cluster table (no d2+CC recompute); struct-max survival rule, (doc_id,len)-only member join",
        Dedup.d10CanonicalPick _),
      ("d7_containment_dedup", "the same committed overlaps table as d2, re-scored as |A∩B|/min — asymmetric duplication Jaccard misses; no inline pair join",
        Dedup.d7ContainmentDedup _),
      ("w8_active_streaks", "gaps-and-islands: per-user window over the deduped (user,day) frame; histogram collapses to bounded rows",
        Analytics.w8ActiveStreaks _),
      ("e8_survival_curve", "KM: user-keyed duration aggregate; cumulative windows only on the bounded distinct-duration frame",
        Analytics.e8SurvivalCurve _),
      ("n4_cell_audit", "per-vector own/best-other cosine folded IN-ROW vs literal centroids; one scan to a 10-row aggregate",
        Similarity.n4CellAudit _),
      ("qc1_classifier_score", "scores against the PUBLISHED model registry weights: one scan + doc-keyed aggregate, zero training jobs",
        graft.operators.Quality.qc1ClassifierScore _),
      ("mix5_curriculum", "row-local quality banding; rank windows partition by (band, shard) — never a band-global sort",
        graft.operators.Pipeline.mix5Curriculum _),
      ("d13_incremental_index", "reads the incrementally-maintained snapshot (clusters ⋈ sizes) — no kernel scan, no pair join, no CC in the read path",
        graft.operators.Incremental.d13IncrementalIndex _),
      ("t25_incremental_tfidf", "batch TF-IDF from maintained corpus stats: postings filtered to the batch, df/n_docs broadcast — corpus never re-tokenized",
        graft.operators.Incremental.t25IncrementalTfidf _),
      ("n11_mmr_rerank", "executor-side MMR: per-query collect_list pool through the compiled graft_mmr kernel — no driver collect, no LocalTableScan",
        Similarity.n11MmrRerank _),
      ("d14_incremental_passages", "batch mask profile from the maintained passage index: batch-slice occurrence rows ⋈ merged stats — no corpus re-scan",
        graft.operators.Incremental.d14IncrementalPassages _),
      ("er4_incremental_entities", "entity ledger from the incrementally-maintained ER index: catalog ⋈ clusters reads, no blocked levenshtein in the read path",
        graft.operators.EntityResolution.er4IncrementalEntities _),
      ("m7_incremental_media", "media dup groups from the maintained pHash index: one clusters read + aggregate — no codec pass, no band join in the read path",
        graft.operators.Multimodal.m7IncrementalMedia _),
      ("n17_incremental_ann", "IVF probe over the INCREMENTALLY-maintained ANN snapshot (n3's exact probe plan at the post-ingest version)",
        graft.operators.IncrementalAnn.n17IncrementalAnn _),
      ("ix4_incremental_postings", "batch postings report from the incrementally-maintained text index: committed postings semi-joined by batch terms — base text never re-tokenized",
        graft.operators.TextIndex.ix4IncrementalPostings _),
      ("prof1_column_profile", "exact profile as one grouped branch per column (pruned single-column scans, (value,count) shuffles) — the multi-NDV Expand is gone",
        graft.operators.Profiling.prof1ColumnProfile _),
      ("f1_feature_bins", "rank-located exact decile boundaries embedded as plan literals; the binning pass is one scan + one bounded aggregate",
        graft.operators.Mining.f1FeatureBins _),
      ("prof8_numeric_corr", "full Pearson matrix from ONE scan: a single 1-row aggregate carries all k+k+C(k,2) exact decimal moments, stack()-unpivoted to pair rows",
        graft.operators.Profiling.prof8NumericCorr _),
      ("g2_pagerank", "read-path over the PUBLISHED rank vector (the 10-round quantized power iteration is the build plan); projection + TakeOrderedAndProject only",
        graft.operators.Graph.g2Pagerank _),
      ("g7_label_propagation", "read-path over the PUBLISHED LPA label table (4 synchronous rounds at build); scan + sort only",
        graft.operators.Graph.g7LabelPropagation _),
      ("ix5_bm25_search", "BM25 entirely from the committed index: term-pushed positional/postings scans, doclens join, 1-row N/avgdl broadcast — corpus parquet absent",
        graft.operators.TextIndex.ix5Bm25Search _),
      ("pipe5_incremental_corpus", "composed batch admission: committed clusters + term plane only — dedup verdict, token floor, keep/drop with zero text scans",
        graft.operators.Incremental.pipe5IncrementalCorpus _),
      ("w11_gini", "grouped-rank Gini: bucket cuts ride as a broadcast 1-row literal, row_number per bucket, offsets from the <=32-row count frame — no single-partition fact-scale window",
        graft.operators.Analytics.w11Gini _),
      ("e12_peak_concurrency", "interval sweep-line: one (user, day) keyed aggregate, the running-sum window on the 2-rows-per-interval boundary plane, partitioned by day",
        graft.operators.Analytics.e12PeakConcurrency _),
      ("f5_feature_hashing", "hashing-trick features: row-local md5 bucketing, ONE count exchange over the bounded (source, bucket) key space",
        graft.operators.Mining.f5FeatureHashing _),
      ("b5_basket_affinity", "Jaccard affinity as a pure read-path over the published basket index (row-group-pruned pair supports); fact table absent",
        graft.operators.Mining.b5BasketAffinity _),
      ("g10_kcore", "fixed-6-round degree peel over the committed edge artifact, lineage truncated per round; fact tables absent",
        graft.operators.Graph.g10KCore _),
      ("t29_incremental_novelty", "batch novelty: committed first-occurrence index + the batch text slice only (pushed modulo filter) — base corpus never rescanned",
        graft.operators.Incremental.t29IncrementalNovelty _),
      ("t28_source_divergence", "per-source JS divergence: one token shuffle, vocab-grain join, int64-quantized order-free folds, closed-form absent-word mass",
        graft.operators.TextAnalysis.t28SourceDivergence _),
      ("d24_lsh_pair_eval", "banding retrieval eval: committed-bands equi-join candidates vs d2's committed-overlaps exact pairs; 1-row broadcast count reductions",
        Dedup.d24LshPairEval _),
      ("n18_truncation_eval", "truncated-dim recall: ONE broadcast-query corpus pass scores both cosines; two query-set-bounded rank windows share the exchange",
        Similarity.n18TruncationEval _),
      ("t30_eval_leak_report", "eval-side leak report: eval gram positions broadcast behind a distinct aggregate; the train gram stream probes map-side and never shuffles",
        TextAnalysis.t30EvalLeakReport _),
      ("mix9_padding_waste", "padding-waste report: one documents scan, row-local CASE-ladder bucketing, one <=17-key aggregate with map-side partials",
        (s: SparkSession, d: String) => graft.operators.Pipeline.mix9PaddingWaste(s, d)),
      ("n19_binary_recall", "binary-quantization recall: row-local sign-bit OR-pack to ONE int64 word, xor+popcount scoring, two query-set-bounded rank windows on one corpus pass",
        Similarity.n19BinaryRecall _))
    val sb = new StringBuilder
    sb.append("# Physical plans of flagship queries (sf0.01, formatted explain)\n\n")
    sb.append("Generated by `sbt \"runMain graft.ExplainDump\"` from the live\n")
    sb.append("plans; PlanAuditSpec asserts the key properties (pushdown,\n")
    sb.append("broadcast, 0-Exchange bucketed join, zero-shuffle IVF assignment,\n")
    sb.append("partition pruning, partial aggregation) so they can't silently\n")
    sb.append("regress.\n")
    flagship.foreach { case (name, why, fn) =>
      val plan = fn(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n$why\n\n```\n$plan```\n")
    }
    // explicit UTF-8: the forked JVM's platform default charset mangles
    // the ⋈/× glyphs in the descriptions to '?'
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.write(sb.toString) finally w.close()
    println(s"[explain] wrote $out")
    spark.stop()
  }
}
