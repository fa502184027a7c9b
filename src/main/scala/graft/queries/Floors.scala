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
}
