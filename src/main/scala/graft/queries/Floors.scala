package graft.queries

/** Central vacuous-output floors (r13 verdict #1 — the registry-wide
  * sweep of QueryDef.minDistinct). Every pooling/fitting/distribution
  * query declares the column whose collapse would make it vacuous and
  * the minimum distinct count it must carry; Verify enforces the floor
  * on the written dump and WITHDRAWS it on violation (or on an
  * unevaluable check), so the oracle gate fails loudly instead of
  * hash-matching a degenerate-on-both-engines result — the one bug
  * class the hash gate structurally cannot see (two r13 incidents:
  * the one-bin calibration diagram and the zero-row rbo oracle).
  *
  * Floor selection is MEASURED, not guessed: tools/floor_check.py
  * carries the same table and validates every floor against full
  * Verify dumps at sf0.001, sf0.01 AND sf0.1 (a floor that trips on
  * legitimate small-SF data would turn the guard into a false alarm).
  * The sweep found six would-be false alarms, all legitimate corpus
  * saturations at one SF or another: q_hour_pivot_min20 is EMPTY at
  * sf0.001; at sf0.1 the near-dup graph is ONE mega-cluster (so
  * q_leakfree_split's rep/split legitimately collapse and it carries
  * no floor), all 20 sources share the saturated global vocabulary
  * (identical HLL estimates and pairwise jaccards), textrank ranks go
  * uniform, and l-diversity/t-closeness groups all saturate their
  * sensitive domains. QueriesSpec asserts this map and the python
  * table stay identical.
  *
  * Queries with query-specific floors declared inline at the QueryDef
  * (the calibration/isotonic trio, q_stream_update_waves) keep those;
  * this map fills everything else.
  */
object Floors {
  val byName: Map[String, (String, Long)] = Map(
    "q_order_count_histogram" -> (("n_orders", 3L)),
    "q_quality_score_histogram" -> (("q", 2L)),
    "q_benford_digit" -> (("digit", 5L)),
    "q_lm_ppl_buckets" -> (("ppl_bucket", 2L)),
    "q_heaps_law" -> (("bucket", 5L)),
    "q_vocab_coverage" -> (("rank", 10L)),
    "q_hour_unpivot" -> (("hour", 12L)),
    "q_quantity_percentiles" -> (("price_p90", 2L)),
    "q_approx_percentiles" -> (("p90_exact", 2L)),
    "q_rolling_median" -> (("med", 5L)),
    "q_stream_rolling_median" -> (("med", 5L)),
    "q_funnel_latency" -> (("p50_s", 2L)),
    "q_winsorized_value" -> (("t_hi", 2L)),
    "q_mad_outliers" -> (("mad", 2L)),
    "q_stream_mad" -> (("mad", 2L)),
    "q_changepoint_split" -> (("split_day", 2L)),
    "q_stream_changepoint" -> (("split_day", 2L)),
    "q_cusum_drift" -> (("ref_sum", 2L)),
    "q_stream_cusum" -> (("ref_sum", 2L)),
    "q_kmeans_clusters" -> (("cluster", 4L)),
    "q_stream_kmeans_assign" -> (("cluster", 4L)),
    "q_kmeans_balanced_sample" -> (("cluster", 4L)),
    "q_grid_density_clusters" -> (("cluster", 2L)),
    "q_semantic_dedup_keepers" -> (("cell", 2L)),
    "q_copurchase_labelprop" -> (("label", 2L)),
    "q_kcore_membership" -> (("in_core", 2L)),
    "q_pq_codes" -> (("code", 4L)),
    "q_dataset_split" -> (("split", 3L)),
    "q_purged_time_split" -> (("role", 3L)),
    "q_curriculum_order" -> (("band", 2L)),
    "q_sequence_packing" -> (("bin", 2L)),
    "q_packing_efficiency" -> (("shard", 2L)),
    "q_training_shuffle" -> (("shard", 2L)),
    "q_source_mixing" -> (("source", 2L)),
    "q_temperature_mix" -> (("source", 2L)),
    "q_token_budget_mix" -> (("source", 2L)),
    "q_stratified_sample" -> (("group_key", 2L)),
    "q_sample_by_key" -> (("source", 2L)),
    "q_knn_label_map" -> (("ap", 2L)),
    "q_knn_label_ndcg" -> (("ndcg", 2L)),
    "q_rbo_rankings" -> (("source", 5L)),
    "q_stream_rbo" -> (("source", 5L)),
    "q_matryoshka_rbo" -> (("rbo_x1e6", 2L)),
    "q_lang_id_confusion" -> (("lang_pred", 2L)),
    "q_conformal_coverage" -> (("qhat", 2L)),
    "q_stream_conformal" -> (("qhat", 2L)),
    "q_chi2_independence" -> (("arm", 2L)),
    "q_ab_test_z" -> (("z", 2L)),
    "q_spearman_corr" -> (("spearman", 2L)),
    "q_value_volume_corr" -> (("corr", 2L)),
    "q_theilsen_trend" -> (("slope_x1e6", 2L)),
    "q_stream_theilsen" -> (("slope_x1e6", 2L)),
    "q_seasonal_mase" -> (("mase_ppm", 2L)),
    "q_stream_seasonal_mase" -> (("mase_ppm", 2L)),
    "q_ewma_band" -> (("ewma_next_x1e6", 2L)),
    "q_stream_ewma" -> (("ewma_next_x1e6", 2L)),
    "q_dow_profile" -> (("dow", 5L)),
    "q_stream_dow_profile" -> (("dow", 5L)),
    "q_best_split_stump" -> (("threshold", 2L)),
    "q_event_transitions" -> (("p", 2L)),
    "q_session_sequences" -> (("support_ppm", 2L)),
    "q_cohort_retention" -> (("week_offset", 2L)),
    "q_rfm_segments" -> (("r_score", 2L)),
    "q_hll_source_vocab" -> (("source", 5L)),
    "q_hll_rolling_users" -> (("day", 5L)),
    "q_stream_hll_rolling" -> (("day", 5L)),
    "q_approx_distinct" -> (("n_orders_exact", 2L)),
    "q_cms_heavy_hitters" -> (("cms_estimate", 2L)),
    "q_stream_cms_sketch" -> (("bucket", 10L)),
    "q_profile_drift" -> (("col_name", 3L)),
    "q_dq_audit" -> (("check_name", 5L)),
    "q_fd_audit" -> (("fd", 3L)),
    "q_funnel_conversion" -> (("step", 3L)),
    "q_readability" -> (("flesch_milli", 10L)),
    "q_text_stats" -> (("stop_ratio", 10L)),
    "q_lm_bigram_score" -> (("lm_score_ppm", 10L)),
    "q_lm_trigram_score" -> (("sb_score_ppm", 10L)),
    "q_stream_lm_score" -> (("lm_score_ppm", 10L)),
    "q_quality_classifier" -> (("score_ppm", 10L)),
    "q_dsir_weights" -> (("weight_ppm", 10L)),
    "q_stream_dsir_weights" -> (("weight_ppm", 10L)),
    "q_dsir_resample" -> (("weight", 5L)),
    "q_feature_hashing" -> (("n_nonzero", 2L)),
    "q_stream_feature_hashing" -> (("n_nonzero", 2L)),
    "q_tfidf_top_terms" -> (("term", 10L)),
    "q_bm25_search" -> (("bm25", 2L)),
    "q_hybrid_retrieval" -> (("rrf", 2L)),
    "q_textrank_keywords" -> (("token", 10L)),
    "q_collocations" -> (("lift_ppm", 5L)),
    "q_source_token_drift" -> (("l1_drift", 10L)),
    "q_source_vocab_overlap" -> (("source_a", 5L)),
    "q_sessionize" -> (("n_events", 2L)),
    "q_stream_sessionize" -> (("n_events", 2L)),
    "q_golden_record" -> (("mode_event_type", 2L)),
    "q_order_date_breakdown" -> (("y", 2L)),
    "q_daily_growth" -> (("day", 5L)),
    "q_rolling_distinct_users" -> (("distinct_actors", 2L)),
    "q_item_neighbors" -> (("cos2_ppm", 10L)),
    "q_basket_lift" -> (("lift", 10L)),
    "q_frequent_triples" -> (("conf_ppm", 2L)),
    "q_copurchase_pagerank" -> (("rank", 10L)),
    "q_ppr_seeded" -> (("rank", 10L)),
    "q_hits_bipartite" -> (("role", 2L)),
    "q_clustering_coefficient" -> (("clustering_ppm", 10L)),
    "q_copurchase_triangles" -> (("n_triangles", 5L)),
    "q_bfs_reachability" -> (("hop", 2L)),
    "q_scd2_apply" -> (("is_current", 2L)),
    "q_scd2_history" -> (("is_current", 2L)),
    "q_stream_scd2" -> (("is_current", 2L)),
    "q_snapshot_diff" -> (("change_type", 3L)),
    "q_series_anomaly" -> (("anomaly", 2L)),
    "q_repetition_signals" -> (("top2gram_frac", 10L)),
    "q_dup_span_stats" -> (("dup_frac", 5L)),
    "q_dup_span_removal" -> (("removed_frac", 5L)),
    "q_self_span_removal" -> (("n_spans", 2L)),
    "q_ngram_novelty" -> (("novelty_ppm", 10L)),
    "q_contamination_flags" -> (("contaminated", 2L)),
    "q_contamination_bloom" -> (("contaminated", 2L)),
    "q_stream_contamination" -> (("contaminated", 2L)),
    "q_stream_contamination_bloom" -> (("contaminated", 2L)),
    "q_k_anonymity" -> (("n", 2L)),
    "q_l_diversity" -> (("n", 2L)),
    "q_t_closeness" -> (("emd_ppm", 2L)),
    "q_k_anon_suppress" -> (("c_mktsegment", 2L)),
    "q_event_paths" -> (("n", 2L)),
    "q_neardup_clusters" -> (("is_keeper", 2L)),
    "q_neardup_best_keepers" -> (("is_keeper", 2L)),
    "q_curation_end2end" -> (("split", 3L)),
    "q_sample_allocation" -> (("alloc", 2L)),
    "q_stream_allocation" -> (("alloc", 2L)))

  /** Explicit floor EXEMPTIONS (r14 verdict #1 — making the sweep
    * self-enforcing): every registry query must either carry a
    * minDistinct floor (inline at its QueryDef or in [[byName]]) or
    * appear here under a reviewed category. QueriesSpec asserts the
    * exact partition — floored and exempt are disjoint and together
    * cover the registry — so a new pooling/fitting/distribution query
    * cannot ship floorless by accident (it breaks the suite until it
    * either declares a floor or is consciously added here), and a
    * renamed/removed query cannot leave a stale entry. Reviewed at
    * round close alongside the floor validation.
    *
    * Categories (the reason a floor adds nothing):
    *  - JOIN/PAIR — output is a match/keeper set; degeneracy changes
    *    the ROW COUNT, which the gate compares directly against the
    *    oracle (plus the QueriesSpec >0-rows check at two SFs).
    *  - PER-ROW — per-entity transform (row per doc/part/event/label);
    *    same row-count argument, content pinned by the hash.
    *  - TOPK — retrieval lists: exactly k rows per probe by
    *    construction, membership + order pinned by the oracle hash.
    *  - ENUM — relational aggregation/enumeration whose group domain
    *    is either row-count-visible or pinned by a dedicated spec
    *    (q1's distinct-group test, the hour pivot's 24-column total).
    *  - SCALAR — deliberately few-row global diagnostics; a distinct
    *    floor on a 1–5 row summary is vacuous by shape.
    *  - SATURATED — a floor was tried in the r13 all-SF validation
    *    and false-alarmed on legitimate corpus saturation (the cases
    *    in the scaladoc above); exempt by measurement, not oversight.
    */
  val exempt: Set[String] = Set(
    // ENUM — relational aggregation/enumeration
    "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
    "q_above_nation_avg_balance", "q_cube_orders", "q_distinct_agg",
    "q_grouping_sets_orders", "q_hour_pivot", "q_incremental_agg",
    "q_region_order_stats", "q_rollup_lineitem", "q_salted_agg",
    "q_setop_lapsed_customers", "q_setop_repeat_customers",
    "q_union_all_priorities", "q_window_function_battery",
    "q_window_running_qty", "q_window_top3_per_supplier",
    "q_zorder_scan_totals", "q_orc_roundtrip_totals",
    "q_stream_hour_pivot", "q_stream_incremental_agg",
    "q_stream_late_pivot", "q_stream_late_pivot_update",
    "q_stream_hll_vocab", "q_events_value_stats",
    "q_attribution_touch", "q_attribution_models",
    "q_pareto_frontier", "q_pareto_frontier_3d",
    "q_pareto_frontier_brand",
    // JOIN/PAIR — match/keeper/pair outputs
    "q_anti_join_inactive", "q_asof_forward_purchase",
    "q_asof_purchase_click", "q_bloom_join_revenue",
    "q_bucketed_join_revenue", "q_containment_join",
    "q_cross_source_dup", "q_embedding_lsh_neardup",
    "q_embedding_neardup_sample", "q_fk_orphans", "q_fuzzy_join_top1",
    "q_geo_neighbor_join", "q_incremental_join_view",
    "q_jaccard_prefix_join", "q_knn_join", "q_media_neardup",
    "q_minhash_lsh_neardup", "q_ngram_jaccard_sample",
    "q_range_join_purchase_click", "q_salted_join",
    "q_semi_join_big_spenders", "q_session_copresence",
    "q_simhash_neardup", "q_simhash_neardup_guarantee",
    "q_sorted_neighborhood", "q_sorted_neighborhood_adaptive",
    "q_stream_containment", "q_stream_join_purchase_click",
    "q_stream_media_neardup", "q_stream_neardup_index",
    "q_neardup_index_served", "q_copurchase_components",
    "q_corpus_dedup_keepers", "q_dedup_exact_keepers",
    "q_stream_dedup_keys",
    // TOPK — fixed-k retrieval lists
    "q_ann_ivf_appended", "q_ann_ivf_served", "q_ann_ivf_topk",
    "q_ann_ivfpq_adaptive", "q_ann_ivfpq_refined", "q_ann_ivfpq_served",
    "q_ann_ivfpq_topk", "q_ann_lsh_topk", "q_ann_pq_adc_topk",
    "q_ann_rp_topk", "q_ann_topk_cosine", "q_ann_topk_quantized",
    "q_media_ann_topk", "q_mips_topk", "q_knn_label_mrr",
    "q_knn_label_precision", "q_index_phrase_lookup",
    "q_margin_mining", "q_margin_mining_ivf", "q_hard_negatives",
    "q_negative_samples", "q_negative_samples_draws",
    "q_negative_samples_sharded", "q_negative_samples_weighted",
    "q_topk_customers", "q_topk_agg_prices_per_supplier",
    // PER-ROW — per-entity transforms
    "q_doc_chunking", "q_doc_fingerprint", "q_token_ids",
    "q_pii_redaction", "q_part_string_ops", "q_events_from_json",
    "q_events_json_extract", "q_resample_ffill", "q_scd2_pit",
    "q_stream_scd2_pit", "q_multimodal_features",
    "q_media_resize_budget", "q_quality_percentile_filter",
    "q_bpe_encode_vocab", "q_stream_bpe_encode", "q_stream_file_sink",
    "q_inverted_index", "q_common_ngrams", "q_bpe_merge_pairs",
    "q_bpe_train_merges", "q_label_centroid_vectors",
    "q_label_centroids", "q_label_outliers",
    // SCALAR — few-row global diagnostics
    "q_abtt_removed_share", "q_agg_strategy_advice",
    "q_brier_decomposition", "q_centroid_auc", "q_cuped_adjust",
    "q_diff_in_diff", "q_embedding_pca_top1", "q_join_size_estimate",
    "q_key_skew", "q_langid_kappa", "q_source_datacard",
    "q_stream_agg_advice", "q_stream_key_skew", "q_bpe_compression",
    "q_degree_assortativity",
    // SATURATED — floors false-alarmed in the r13 all-SF validation
    "q_hour_pivot_min20", "q_leakfree_split", "q_hll_overlap")
}
