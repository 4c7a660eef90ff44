package graft

/** Plan-shape regression guard: no registered query may plan a
  * CartesianProduct or BroadcastNestedLoopJoin — the two operators
  * that turn into O(n²) work at cluster scale — outside a small,
  * justified allowlist. This is what keeps the all-pairs plans
  * (pre-round-4 q51/q56) from reappearing: a rewrite that silently
  * degrades a bucketed equi-join back to a nested loop fails CI
  * instead of waiting for a manual plan audit.
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries whose nested-loop/cartesian node is intentional:
    *   - q03: numericHistogram broadcasts a 1-row min/max aggregate
    *     (a 1×N broadcast is a map stage, not a pair explosion);
    *   - q48: the exact ANN baseline broadcasts the fixed small query
    *     set — O(Q·N) map work by design, with q49/q52 as scale paths;
    *   - q51: the exact near-dup oracle baseline, kept only to anchor
    *     q51b's recall spec (q51b is the production form);
    *   - q52: broadcasts the K=16 centroid table (fixed size);
    *   - q69: broadcasts the 1-row corpus-size aggregate (the q03
    *     scalar-broadcast pattern);
    *   - q73: broadcasts the 1-row 512-byte Bloom sketch (same
    *     pattern — membership testing is map work);
    *   - q84: broadcasts the 1-row budget/weight-normalizer totals
    *     (the q03/q69 scalar pattern);
    *   - q53: the source×source inequality join runs over
    *     POST-AGGREGATION rows (one sketch per corpus) — its input
    *     cardinality is the number of corpora, independent of data
    *     volume, so the nested loop never grows with the 100 TB;
    *   - q53b: same source×source post-aggregation matrix as q53
    *     (the intersection COUNTS come from an equi-join on shingle
    *     digests; only the ≤ sources² assembly is a nested loop);
    *   - q89: broadcasts the 1-row total-token aggregate over the K
    *     surviving vocab rows (the q03/q69 scalar pattern);
    *   - q96: broadcasts the 1-row token-budget aggregate (same
    *     scalar pattern);
    *   - q99: broadcasts the 1-row 1.5 KB count-min sketch over the
    *     20 probe rows (the q73 sketch-broadcast pattern);
    *   - q103: broadcasts the 1-row selected-merge pair for the
    *     map-stage rewrite (the q03/q73 scalar pattern);
    *   - q104: broadcasts the 1-row z-range MAX that sizes the
    *     clustering cells (the q03/q69 scalar pattern);
    *   - q108: broadcasts the 1-row corpus-totals aggregate for BM25
    *     normalization (the q03/q69 scalar pattern).
    */
  private val allowlist = Set(
    "q03_price_histogram",
    "q48_ann_bruteforce",
    "q51_embedding_neardup",
    "q52_ann_ivf",
    "q53_source_similarity",
    "q53b_source_similarity_sql",
    "q69_tfidf_topterms",
    "q73_bloom_blocklist",
    "q84_mixture_sample",
    "q89_vocab_build",
    "q96_quality_budget",
    "q99_heavy_hitters",
    "q103_bpe_merge_apply",
    "q104_zorder_layout",
    "q108_bm25_retrieval",
    "q112_dsir_importance",
    "q114_bigram_lm_score",
    "q126_phrase_search",
    "q129_skew_report",
    "q131_metadata_association",
    "q136_gap_fill",
    // q128: the body column's profile assembles two 1-row aggregates
    // (min/max extremes + digest ndv) via broadcast — split on
    // purpose so neither shuffle carries document text (see q128)
    "q128_table_profile",
    // q138: broadcasts the 1-row corpus-totals aggregate that
    // denominates the ppm/recall metrics (the q03 scalar pattern)
    "q138_lsh_pruning",
    // q153: broadcasts the 1-row 32 KiB Bloom sketch for the
    // map-side semi-join pre-filter (the q73/q99 sketch pattern)
    "q153_bloom_semi_join",
    // q168: broadcasts the 1-row grand-total N that denominates the
    // chi-squared cells (the q03/q69 scalar pattern)
    "q168_chisq_drift",
    // q169: broadcasts the 1-row corpus doc count that denominates
    // the lift ratio (the q03/q69 scalar pattern)
    "q169_cooccurrence_lift",
    // q181: broadcasts the 1-row point count that scales the derived
    // coordinate domain (the q03/q69 scalar pattern)
    "q181_grid_spatial_join",
    // q184: broadcasts the 1-row row-total that denominates the
    // equi-depth bucket index (the q03/q69 scalar pattern)
    "q184_column_histogram",
    // q193: broadcasts the 1-row corpus total that scales the global
    // quantile index (the q03/q69 scalar pattern)
    "q193_quantile_normalize",
    // q201: broadcasts the 1-row total plus the bounded distinct-value
    // spine for the sources × spine step functions (the q136 pattern)
    "q201_ks_drift",
    // q202: broadcasts the bounded percentile-grid × 1-row-total table
    // for the first-crossing pick (the q136 pattern)
    "q202_weighted_quantiles",
    // q203: broadcasts the 1-row (n, total) aggregate that normalizes
    // the Gini numerator (the q03/q69 scalar pattern)
    "q203_gini_concentration",
    // q204: broadcasts the 1-row corpus total that turns per-source
    // counts into rest-of-corpus counts (the q03/q69 scalar pattern)
    "q204_mann_whitney",
    // q219: the EMD spine crossJoins two POST-AGGREGATION frames
    // (privacy cells × value bands, ~150×10 — the q136 bounded
    // derived-domain pattern); row volume never reaches the join
    "q219_t_closeness",
    // q223: assembles the 1-row CBO estimate with the 1-row actual
    // join count (the q03/q69 scalar pattern)
    "q223_join_cardinality",
    // q227: broadcasts the 1-row global (N, ΣT) aggregate that the
    // smoothed encoder shrinks toward (the q03/q69 scalar pattern)
    "q227_target_encoding",
    // q247: broadcasts the 1-row basket total that denominates the
    // lift (the q03/q69 scalar pattern)
    "q247_association_rules",
    // q241: broadcasts the 1-row edge count that denominates the
    // modularity cells (the q03/q69 scalar pattern)
    "q241_modularity",
    // q242: broadcasts the bounded 4-row box table derived from the
    // 1-row (pmax, smax) aggregate (the q136 bounded-domain pattern)
    "q242_hilbert_layout",
    // q230: broadcasts the 1-row pooled-moment aggregate that the
    // CUPED adjustment denominates (the q03/q69 scalar pattern)
    "q230_cuped_readout",
    // q228: the isotonic minimax joins bounded bin-aggregate frames
    // (≤16 rows each) on range predicates (the q136 bounded
    // derived-domain pattern)
    "q228_isotonic_calibration",
    // q265: broadcasts the 1-row merged corpus-totals aggregate for
    // BM25 normalization (q108's scalar pattern through the
    // maintained-index state)
    "q265_incremental_bm25",
    // q268: broadcasts the 1-row merged totals (recall stage, q108's
    // pattern) and the 1-row fixed query embedding (rerank stage)
    "q268_two_stage_retrieval",
    // q273: broadcasts the 1-row totals-minus-delete-totals scalar
    // pair for BM25 normalization (q265's scalar pattern on the
    // subtract path). NOTE q275 also runs a q48-class broadcast cross
    // join (NumQueries-row query vectors × corpus, the bench-only
    // exact ground-truth leg) but it sits behind a lazy checkpoint,
    // which cuts the logical plan the sweep explains — justified for
    // the same reason as q48/q272, documented here since the guard
    // cannot see it
    "q273_bm25_delete_maintenance",
    // q282: the mixed batch composes subtract + merge, so the 1-row
    // totals scalar crosses twice (q265's pattern on the subtract
    // path then the add path) before q108's normalization broadcast
    "q282_bm25_mixed_batch",
    // q272: the same two 1-row broadcasts as q268, plus the exact
    // ground-truth leg's 1-row query-embedding broadcast over the
    // corpus (the q48 baseline pattern — affordable only at bench
    // scale, which is the point of the recall measurement)
    "q272_cascade_recall")

  private val banned = Seq("BroadcastNestedLoopJoin", "CartesianProduct")

  test("no query plans a nested-loop/cartesian join outside the allowlist") {
    // streaming queries execute a stream on construction; skip them by
    // MODULE (not by name pattern — a q6x batch query must be guarded)
    val streaming = graft.streaming.StreamingQueries.specs.map(_.name).toSet
    val guarded = SparkEntry.allSpecs.filterNot(s => streaming(s.name))
    val offenders = guarded.flatMap { spec =>
      val plan = spec.fn(spark, sf).queryExecution.executedPlan.toString
      val hits = banned.filter(plan.contains)
      if (hits.nonEmpty && !allowlist.contains(spec.name)) Some(spec.name -> hits)
      else None
    }
    assert(offenders.isEmpty,
      s"scale-hostile join nodes outside the allowlist: $offenders")
  }

  test("allowlisted exceptions still exist (keep the allowlist tight)") {
    // if an allowlisted query stops planning a nested loop, it should
    // be REMOVED from the allowlist, not silently carried forever
    val stale = allowlist.toSeq.sorted.filter { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      !banned.exists(plan.contains)
    }
    assert(stale.isEmpty, s"allowlist entries no longer needed: $stale")
  }
}
