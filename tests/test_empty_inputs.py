"""Empty-input robustness: every operator must be a total function over
whatever data exists (SURVEY §2.5 data-coverage note) — at 100 TB a
partition-pruned scan routinely yields zero rows, and an operator that
assumes non-emptiness crashes the whole job."""

from __future__ import annotations

import pytest

from u_s__non_farm_payrolls_an_olap_analysis_spark import registry
from u_s__non_farm_payrolls_an_olap_analysis_spark.io import TABLES, read_table

# queries spanning every module / operator family
REPRESENTATIVE = [
    "scan_table",
    "slice_avg_by_year",
    "filter_threshold",
    "window_pct_change_global",
    "dice_recovery_asof",
    "top1_by_metric",
    "join_broadcast_dim",
    "join_range_asof",
    "agg_grouping_sets_cube",
    "window_rank_topk_per_group",
    "setop_union_except",
    "json_extract_props",
    "text_tokenize_tf",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "sim_search_cosine",
    "pivot_month_by_year",
    "timeseries_gap_fill",
    "sessionize_batch",
    "dq_checks",
    "grouped_map_normalize",
    # round-2 additions
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q14_promo_revenue_share",
    "tpch_q15_top_supplier",
    "sql_exists_big_order",
    "sample_by_key_mod",
    "split_train_test",
    "join_interval_bucketed",
    "window_distribution_ranks",
    "dedup_incremental_new_docs",
    "text_clean_funnel",
    "datetime_functions_showcase",
    "agg_salted_two_phase",
    "sim_search_ann_ivf_kmeans",
    "scan_partition_pruned",
    # round-4 additions
    "str_format_display",
    "dedup_embedding_cosine",
    "join_skew_aqe",
    "tpch_q18_large_volume",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q4_order_priority",
    "tpch_q13_custdist",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_pred",
    "tpch_q22_global_sales_opportunity",
    "text_fuzzy_match",
    "multimodal_frame_sample",
    "window_first_last_nth",
    "join_full_outer_reconcile",
    "sql_dashboard_q4_growth",
    "sql_dashboard_sharpest_drop",
    "sql_dashboard_decade_case",
    # round-8 additions
    "pii_detect_stats",
    "pii_redact",
    "decontam_overlap",
    "quality_repetition_signals",
    "chunk_documents",
    "vocab_coverage",
    "layout_zorder_key",
    "text_pmi_collocations",
    "stream_docs_dedup_fingerprint",
    "scan_dpp_dim_filter",
    "join_bucketed_zero_shuffle",
    "stream_upsert_foreach_batch",
    "dedup_embedding_prod_planted",
    "pack_training_sequences",
    "join_bitmap_prefiltered",
    "dedup_cluster_size_histogram",
    "sample_corpus_mixture",
    "dedup_keep_best",
    "source_api_stream",
    "layout_compact_small_files",
    "cdc_apply_changes",
    "dedup_cross_corpus_jaccard",
    "mv_incremental_refresh",
    "timeseries_interpolate_linear",
    "sample_domain_cap",
    "table_stats_collect",
    "cdc_read_asof",
    "dq_referential_integrity",
    "agg_weighted_percentile",
    "quality_unigram_surprisal",
    "join_asof_nearest",
    "corpus_shuffle_shards",
    "vocab_bpe_pair_counts",
    "norm_winsorize_clip",
    "stream_left_outer_join",
    "sql_lateral_topk_per_group",
    "sql_recursive_month_spine",
    "agg_funnel_conversion",
    "retention_cohorts",
    "sink_python_datasource",
    "scan_schema_evolution",
    "layout_partition_overwrite_dynamic",
    "scalar_try_functions",
    "array_higher_order_funcs",
    "agg_linear_trend",
    "stream_full_outer_join",
    # round-10 additions
    "dedup_minhash_planted",
    "embedding_matryoshka_truncate",
    "sim_search_int8_mips",
    "quality_gopher_rules",
    "text_bm25_topk",
    "dedup_semantic_kmeans",
    "arrow_map_doc_stats",
    "arrow_grouped_source_stats",
    "sql_pipe_syntax_rollup",
    "sim_search_hybrid_rrf",
    "quality_ccnet_buckets",
    "agg_count_min_sketch",
    "udtf_table_arg_year_profile",
    "string_collation_compare",
    "sql_parameterized_args",
    "text_langid_ngram_profile",
    "graph_pagerank_tokens",
    "sample_temperature_mixture",
    "quality_linear_classifier",
    "dedup_exact_substring_spans",
    "sample_dsir_importance",
    "dedup_containment_ngram",
    "stream_static_enrich_join",
    "sample_quantile_threshold_cut",
    "quality_stupid_backoff_logprob",
    "sim_search_hard_negatives",
    "chunk_sliding_window",
    "text_winnow_fingerprint",
    "dedup_allpairs_prefix",
    "text_bpe_encode_count",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "sample_weighted_reservoir",
    "dedup_ppjoin",
    "stream_topk_space_saving",
    "privacy_t_closeness",
    "graph_triangle_counts",
    "mine_association_rules",
    "timeseries_ewma_smooth",
    "dq_benford_first_digit",
    "privacy_dp_noisy_counts",
    "rfm_segmentation",
    "abc_pareto_parts",
    "events_attribution_last_touch",
    "corpus_zipf_fit",
    "events_markov_transitions",
    "graph_label_propagation",
    "text_keyword_extract_rake",
]


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    """Empty copies of every table with the real schemas."""
    d = tmp_path_factory.mktemp("empty")
    for t in TABLES:
        df = read_table(spark, "/root/testdata/sf0.001", t)
        df.limit(0).write.mode("overwrite").parquet(f"{d}/{t}.parquet")
    return str(d)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_total_on_empty_tables(spark, empty_dir, name):
    df = registry.queries()[name](spark, empty_dir)
    rows = df.collect()  # must not raise; row count is semantics-dependent
    assert isinstance(rows, list)
