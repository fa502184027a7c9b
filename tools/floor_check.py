#!/usr/bin/env python3
"""Validate candidate minDistinct floors against Verify dumps.

Usage: python3 tools/floor_check.py <verifyOutDir> [...more dirs]

For each candidate (query, column, floor) below, reports the observed
distinct count in every given dump dir and flags any violation. Used to
select floors that hold at ALL scale factors before declaring them in
the registry (a floor that trips on legitimate small-SF data would turn
the vacuous-output guard into a false alarm).

The table mirrors the QueryDef.minDistinct declarations; keep the two
in sync (QueriesSpec asserts the registry side covers this file).
"""
import sys, glob, os
import pandas as pd

# (query, column, floor)
CANDIDATES = [
    ("q_order_count_histogram", "n_orders", 3),
    ("q_quality_score_histogram", "q", 2),
    ("q_benford_digit", "digit", 5),
    ("q_lm_ppl_buckets", "ppl_bucket", 2),
    ("q_heaps_law", "bucket", 5),
    ("q_vocab_coverage", "rank", 10),
    ("q_hour_unpivot", "hour", 12),
    ("q_quantity_percentiles", "price_p90", 2),
    ("q_approx_percentiles", "p90_exact", 2),
    ("q_rolling_median", "med", 5),
    ("q_stream_rolling_median", "med", 5),
    ("q_funnel_latency", "p50_s", 2),
    ("q_winsorized_value", "t_hi", 2),
    ("q_mad_outliers", "mad", 2),
    ("q_stream_mad", "mad", 2),
    ("q_changepoint_split", "split_day", 2),
    ("q_stream_changepoint", "split_day", 2),
    ("q_cusum_drift", "ref_sum", 2),
    ("q_stream_cusum", "ref_sum", 2),
    ("q_kmeans_clusters", "cluster", 4),
    ("q_stream_kmeans_assign", "cluster", 4),
    ("q_kmeans_balanced_sample", "cluster", 4),
    ("q_grid_density_clusters", "cluster", 2),
    ("q_semantic_dedup_keepers", "cell", 2),
    ("q_copurchase_labelprop", "label", 2),
    ("q_kcore_membership", "in_core", 2),
    ("q_pq_codes", "code", 4),
    ("q_dataset_split", "split", 3),
    ("q_purged_time_split", "role", 3),
    ("q_curriculum_order", "band", 2),
    ("q_sequence_packing", "bin", 2),
    ("q_packing_efficiency", "shard", 2),
    ("q_training_shuffle", "shard", 2),
    ("q_source_mixing", "source", 2),
    ("q_temperature_mix", "source", 2),
    ("q_token_budget_mix", "source", 2),
    ("q_stratified_sample", "group_key", 2),
    ("q_sample_by_key", "source", 2),
    ("q_knn_label_map", "ap", 2),
    ("q_knn_label_ndcg", "ndcg", 2),
    ("q_rbo_rankings", "source", 5),
    ("q_stream_rbo", "source", 5),
    ("q_matryoshka_rbo", "rbo_x1e6", 2),
    ("q_lang_id_confusion", "lang_pred", 2),
    ("q_conformal_coverage", "qhat", 2),
    ("q_stream_conformal", "qhat", 2),
    ("q_chi2_independence", "arm", 2),
    ("q_ab_test_z", "z", 2),
    ("q_spearman_corr", "spearman", 2),
    ("q_value_volume_corr", "corr", 2),
    ("q_theilsen_trend", "slope_x1e6", 2),
    ("q_stream_theilsen", "slope_x1e6", 2),
    ("q_seasonal_mase", "mase_ppm", 2),
    ("q_stream_seasonal_mase", "mase_ppm", 2),
    ("q_ewma_band", "ewma_next_x1e6", 2),
    ("q_stream_ewma", "ewma_next_x1e6", 2),
    ("q_dow_profile", "dow", 5),
    ("q_stream_dow_profile", "dow", 5),
    ("q_best_split_stump", "threshold", 2),
    ("q_event_transitions", "p", 2),
    ("q_session_sequences", "support_ppm", 2),
    ("q_cohort_retention", "week_offset", 2),
    ("q_rfm_segments", "r_score", 2),
    ("q_hll_source_vocab", "source", 5),
    ("q_hll_rolling_users", "day", 5),
    ("q_stream_hll_rolling", "day", 5),
    ("q_approx_distinct", "n_orders_exact", 2),
    ("q_cms_heavy_hitters", "cms_estimate", 2),
    ("q_stream_cms_sketch", "bucket", 10),
    ("q_profile_drift", "col_name", 3),
    ("q_dq_audit", "check_name", 5),
    ("q_fd_audit", "fd", 3),
    ("q_funnel_conversion", "step", 3),
    ("q_readability", "flesch_milli", 10),
    ("q_text_stats", "stop_ratio", 10),
    ("q_lm_bigram_score", "lm_score_ppm", 10),
    ("q_lm_trigram_score", "sb_score_ppm", 10),
    ("q_stream_lm_score", "lm_score_ppm", 10),
    ("q_quality_classifier", "score_ppm", 10),
    ("q_dsir_weights", "weight_ppm", 10),
    ("q_stream_dsir_weights", "weight_ppm", 10),
    ("q_dsir_resample", "weight", 5),
    ("q_feature_hashing", "n_nonzero", 2),
    ("q_stream_feature_hashing", "n_nonzero", 2),
    ("q_tfidf_top_terms", "term", 10),
    ("q_bm25_search", "bm25", 2),
    ("q_hybrid_retrieval", "rrf", 2),
    ("q_textrank_keywords", "token", 10),
    ("q_collocations", "lift_ppm", 5),
    ("q_source_token_drift", "l1_drift", 10),
    ("q_source_vocab_overlap", "source_a", 5),
    ("q_sessionize", "n_events", 2),
    ("q_stream_sessionize", "n_events", 2),
    ("q_golden_record", "mode_event_type", 2),
    ("q_order_date_breakdown", "y", 2),
    ("q_daily_growth", "day", 5),
    ("q_rolling_distinct_users", "distinct_actors", 2),
    ("q_item_neighbors", "cos2_ppm", 10),
    ("q_basket_lift", "lift", 10),
    ("q_frequent_triples", "conf_ppm", 2),
    ("q_copurchase_pagerank", "rank", 10),
    ("q_ppr_seeded", "rank", 10),
    ("q_hits_bipartite", "role", 2),
    ("q_clustering_coefficient", "clustering_ppm", 10),
    ("q_copurchase_triangles", "n_triangles", 5),
    ("q_bfs_reachability", "hop", 2),
    ("q_scd2_apply", "is_current", 2),
    ("q_scd2_history", "is_current", 2),
    ("q_stream_scd2", "is_current", 2),
    ("q_snapshot_diff", "change_type", 3),
    ("q_series_anomaly", "anomaly", 2),
    ("q_repetition_signals", "top2gram_frac", 10),
    ("q_dup_span_stats", "dup_frac", 5),
    ("q_dup_span_removal", "removed_frac", 5),
    ("q_self_span_removal", "n_spans", 2),
    ("q_ngram_novelty", "novelty_ppm", 10),
    ("q_contamination_flags", "contaminated", 2),
    ("q_contamination_bloom", "contaminated", 2),
    ("q_stream_contamination", "contaminated", 2),
    ("q_stream_contamination_bloom", "contaminated", 2),
    ("q_k_anonymity", "n", 2),
    ("q_l_diversity", "n", 2),
    ("q_t_closeness", "emd_ppm", 2),
    ("q_k_anon_suppress", "c_mktsegment", 2),
    ("q_event_paths", "n", 2),
    ("q_neardup_clusters", "is_keeper", 2),
    ("q_neardup_best_keepers", "is_keeper", 2),
    ("q_curation_end2end", "split", 3),
    ("q_sample_allocation", "alloc", 2),
    ("q_stream_allocation", "alloc", 2),
]


def main():
    dirs = sys.argv[1:]
    bad = 0
    for q, c, floor in CANDIDATES:
        obs = []
        for d in dirs:
            files = glob.glob(f"{d}/{q}/*.parquet")
            if not files:
                obs.append("ABSENT")
                continue
            df = pd.concat([pd.read_parquet(p) for p in files],
                           ignore_index=True)
            if c not in df.columns:
                obs.append("NOCOL")
            else:
                obs.append(df[c].nunique())
        viol = any(isinstance(o, str) or o < floor for o in obs)
        if viol:
            bad += 1
            print(f"VIOLATION {q}.{c} floor={floor} observed={obs}")
    print(f"\n{len(CANDIDATES)} candidates, {bad} violations "
          f"across {len(dirs)} dump dir(s)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
