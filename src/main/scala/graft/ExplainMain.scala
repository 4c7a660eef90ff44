package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for the named
  * queries (or a representative set) so pushdown, join strategies,
  * partition pruning, and codegen spans can be eyeballed.
  *
  * Usage: runMain graft.ExplainMain [sfDir] [queryName...]
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q21_pricing_summary", "q20_star_denorm", "q22_top_customers",
        "q03_price_histogram", "q44_exact_dedup", "q45_ngram_jaccard",
        "q46_minhash_lsh", "q48_ann_bruteforce", "q51b_embedding_neardup_blocked",
        "q56_fuzzy_match", "q57_embedding_quantize", "q59_dup_clusters",
        "q67_decontaminate", "q69_tfidf_topterms", "q70_sequence_packing",
        "q73_bloom_blocklist", "q75_scd1_upsert", "q78_log_compaction",
        "q49b_ann_lsh_exact", "q108_bm25_retrieval", "q111_quality_classifier",
        "q115_hybrid_rrf", "q116_neardup_contamination", "q126_phrase_search",
        "q133_incremental_rollup",
        // round-6 heavies (VERDICT r6 task 7): the slowest current
        // queries — their plans are the ones worth eyeballing per round
        "q83b_semantic_dedup_sql", "q120_dup_frames",
        "q124_retention_cohorts", "q134_active_users", "q137_ab_experiment",
        // round-7 additions worth plan-eyeballing: the iterative graph
        // pair (share the q45 pair pipeline), the salted join, and the
        // bitmap UDAF (ObjectHashAggregate two-phase)
        "q142_pagerank_hubs", "q143_triangle_count", "q144_salted_join",
        "q146_bitmap_distinct",
        // round-7 second-wave additions: the lossless prefix-filter
        // join, the Bloom semi-join reduction, the two-phase Merkle
        // sync, CDC chunking, and the attribution interval join
        "q152_prefix_filter_join", "q153_bloom_semi_join",
        "q158_merkle_diff", "q160_cdc_chunking", "q162_position_attribution",
        // round-7 fourth-wave heavies: the FastSS join (AQE-coalesce
        // fix), the survivorship build (CC floor + 3 window passes),
        // the closure-squaring rollup, the grid radius join, and the
        // bucketized quantile-normalize lookup
        "q180_edit_distance_join", "q194_survivorship",
        "q178_hierarchy_rollup", "q181_grid_spatial_join",
        "q193_quantile_normalize",
        // round-7 fifth-wave: the iterative SSSP/k-core pair (q45
        // floor + per-round checkpoints), the ANN eval double
        // pipeline, the MV-rewrite demo, and the blocked linkage join
        "q209_shortest_paths", "q213_kcore", "q211_ann_eval",
        "q210_mv_rewrite", "q214_record_linkage",
        // round-7 sixth-wave: the three registry-driven optimizer
        // rules (MV rewrite above; elimination + policy here), the
        // pigeonhole Hamming join, nested pruning, and the federated
        // broadcast join
        "q231_join_elimination", "q238_row_policy",
        "q229_simhash_hamming_join", "q236_nested_pushdown",
        "q239_federated_join", "q233_link_prediction",
        // round-8: the six DistributedRank rewrites' plans (the
        // bucket-partitioned windows), DBSCAN, the moment-matrix MMD,
        // and the bloom point lookup
        "q217_theta_set_ops", "q224_rfm_segments", "q242_hilbert_layout",
        "q255_dbscan_clusters", "q256_mmd_two_sample", "q257_bloom_point_lookup",
        // round-9: the re-geometried DBSCAN blocking measurement, the
        // incremental quotient-graph CC, and the real-codec batch map
        "q259_dbscan_blocking_power", "q260_incremental_dup_clusters",
        "q50e_codec_roundtrip",
        // round 9: incremental index maintenance, the retrieval
        // cascade, lakehouse MERGE, stats-answered aggregates
        "q262_incremental_ivf", "q265_incremental_bm25",
        "q268_two_stage_retrieval", "q267_manifest_merge",
        "q269_stats_pushdown", "q50g_video_roundtrip",
        // round 11: BM25 delete maintenance, the manifest change
        // feed, and the IVF probe-recall measurement
        "q273_bm25_delete_maintenance", "q274_manifest_change_feed",
        "q275_ivf_probe_recall")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
