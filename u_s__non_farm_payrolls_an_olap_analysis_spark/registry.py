"""Assembles the driver contract: ``queries()`` and ``oracle_sql()``.

Each operator module exposes ``QUERIES`` (name → (spark, sf_dir) -> DataFrame)
and ``ORACLE`` (name → DuckDB SQL). This module merges them and enforces the
invariants the driver's correctness gate depends on:

- no duplicate names across modules;
- every oracle key has a query (queries without an oracle are allowed —
  they get the driver's weaker rows-only check and are listed in
  ``NO_ORACLE`` with a reason).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    aggregates,
    analytics,
    custom_udf,
    dedup,
    graph,
    incremental,
    joins,
    json_ops,
    layout,
    llm_prep,
    multimodal,
    olap,
    reshape,
    sampling,
    scalars,
    setops,
    similarity,
    sketches,
    sources,
    sql_api,
    text,
    tpch_analytics,
    tpch_partsupp,
)
from .streaming import stateful, stream_windows

QueryFn = Callable[[SparkSession, str], DataFrame]

# Merge order IS the driver's CORRECTNESS sample order (first 50 keys are
# hashed against their DuckDB oracles each round). Round-5 rotation: the
# tail keys never driver-sampled in rounds 1-4 lead (tpch additions,
# sources, sql_dashboard, round-3/4 joins/aggregates additions, and
# analytics' dq_anomaly_zscore — its module dict is ordered to put that
# key first). The brand-new Q2/Q9/Q20 partsupp shapes lead outright; the
# three keys they displace from slot 47-49 (window_distribution_ranks /
# first_last_nth / trailing_range_frame) all have green r4 rows. The
# LLM-pipeline pack got its rows in round 4 and rotates to the tail; olap
# has rows from rounds 1-3.
_MODULES = [
    tpch_partsupp,
    tpch_analytics,
    sources,
    sql_api,
    joins,
    aggregates,
    analytics,
    dedup,
    similarity,
    graph,
    text,
    llm_prep,
    multimodal,
    json_ops,
    setops,
    custom_udf,
    stream_windows,
    reshape,
    scalars,
    sampling,
    sketches,
    olap,
    layout,
    incremental,
    stateful,
]


# The driver samples the FIRST 50 keys of queries() each round; this
# list leads the iteration so module insertion order can't push a key
# that needs a fresh CORRECTNESS row out of the window. Guarded by
# tests/test_registry_contract.py (subset, duplicate-free, leads
# iteration) — prune entries once their round's JSON records them
# (CLAUDE.md rule 7).
# Round-10 rotation (final, end of session 4): every r9-recorded key
# pruned. Leads with (a) scalar_try_functions (try_cast anchors changed
# ^..$ → \\A..\\z this round, round-10 ADVICE) and sessionize_batch (gap
# arithmetic rewritten; now the headline events query) — code changed,
# fresh rows needed; then (b) ALL 45 round-10 additions in landing
# order — a new key has NO driver row anywhere, so it outranks every
# key with historical evidence; then (c) the r4-evidence quartet, then
# the r6 tail (TPC-H Q1-Q22 block, sql_dashboard, sources, r3-era
# joins/aggregates). With session 5's three additions the first 50 =
# (a) 2 changed + (b) 48 never-sampled round-10 keys exactly; the r4
# quartet and the whole r6 tail roll into round 11 — prune
# r10-recorded keys then and lead with that tail.
_SAMPLE_PRIORITY = [
    # guard-anchor change this round (round-10 ADVICE) — fresh row
    "scalar_try_functions",
    # gap arithmetic rewritten epoch-decomposition → interval compare in
    # round 10 (same sessions, now a headline query) — fresh row
    "sessionize_batch",
    # NEW in round 10 (completes the planted-harness family for the
    # rows-only LSH keys) — needs its first driver row
    "dedup_minhash_planted",
    # NEW in round 10 — MRL prefix truncation + renormalize
    "embedding_matryoshka_truncate",
    # NEW in round 10 — int8-quantized MIPS search (exact integer dot)
    "sim_search_int8_mips",
    # NEW in round 10 — published Gopher rejection-rule gates
    "quality_gopher_rules",
    # NEW in round 10 — BM25 top-k retrieval (inverted-index candidates)
    "text_bm25_topk",
    # NEW in round 10 — SemDeDup: k-means-partitioned semantic dedup
    "dedup_semantic_kmeans",
    # NEW in round 10 — Arrow-native map / grouped-map surfaces
    "arrow_map_doc_stats",
    "arrow_grouped_source_stats",
    # NEW in round 10 — Spark 4 SQL pipe-syntax front-end
    "sql_pipe_syntax_rollup",
    # NEW in round 10 — hybrid BM25+vector retrieval via RRF
    "sim_search_hybrid_rrf",
    # NEW in round 10 — CCNet perplexity-bucket corpus split
    "quality_ccnet_buckets",
    # NEW in round 10 — portable md5 CMS, sketch content oracle-checked
    "agg_count_min_sketch",
    # NEW in round 10 — UDTF with TABLE argument (PARTITION BY)
    "udtf_table_arg_year_profile",
    # NEW in round 10 — Spark 4 collation semantics vs lower() twin
    "string_collation_compare",
    # NEW in round 10 — named-parameter SQL binding
    "sql_parameterized_args",
    # NEW in round 10 — Cavnar-Trenkle n-gram rank-profile language ID
    "text_langid_ngram_profile",
    # NEW in round 10 — edge-partitioned PageRank power iteration
    "graph_pagerank_tokens",
    # NEW in round 10 — T5/UniMax temperature-scaled mixture weights
    "sample_temperature_mixture",
    # NEW in round 10 — linear hashed-feature quality classifier apply
    "quality_linear_classifier",
    # NEW in round 10 — ExactSubstr duplicated-span detection
    "dedup_exact_substring_spans",
    # NEW in round 10 — DSIR hashed-n-gram importance resampling
    "sample_dsir_importance",
    # NEW in round 10 — Broder asymmetric shingle containment
    "dedup_containment_ngram",
    # NEW in round 10 — stream-static broadcast dimension enrichment
    "stream_static_enrich_join",
    # NEW in round 10 — broadcast quantile-threshold corpus cut
    "sample_quantile_threshold_cut",
    # NEW in round 10 — Stupid Backoff bigram LM scoring
    "quality_stupid_backoff_logprob",
    # NEW in round 10 — DPR/ANCE hard-negative mining band
    "sim_search_hard_negatives",
    # NEW in round 10 — sliding-window chunking with overlap
    "chunk_sliding_window",
    # NEW in round 10 — winnowing fingerprints + prefix-filtered ssjoin
    "text_winnow_fingerprint",
    "dedup_allpairs_prefix",
    "text_bpe_encode_count",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "sample_weighted_reservoir",
    "dedup_ppjoin",
    # NEW in round 10 — distributed Space-Saving streaming heavy hitters
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
    # NEW in round 10 (session 5) — clickstream Markov transition matrix
    "events_markov_transitions",
    # NEW in round 10 (session 5) — label-propagation community detection
    "graph_label_propagation",
    # NEW in round 10 (session 5) — RAKE per-document keyword extraction
    "text_keyword_extract_rake",
    # latest driver row r4 — oldest non-round-10 evidence; NEVER-sampled
    # round-10 keys above outrank these (they have r4 rows to fall back
    # on; a new key has none)
    "udtf_month_spine",
    "unpivot_measures",
    "window_distribution_ranks",
    "window_first_last_nth",
    # latest driver row r6 — oldest remaining evidence; tail rolls
    "agg_boolean_family",
    "agg_distinct_and_approx",
    "agg_grouping_sets_cube",
    "agg_rollup_year_quarter",
    "agg_salted_two_phase",
    "corpus_mix_report",
    "dq_anomaly_zscore",
    "embedding_quantize_int8",
    "join_broadcast_dim",
    "join_full_outer_reconcile",
    "join_null_safe_eq",
    "join_range_asof",
    "join_semi_anti",
    "join_shuffle_3way",
    "join_skew_aqe",
    "scd2_history_merge",
    "sink_jdbc_upsert",
    "source_api_extract",
    "sql_dashboard_decade_case",
    "sql_dashboard_q4_growth",
    "sql_dashboard_sharpest_drop",
    "sql_exists_big_order",
    "sql_in_subquery_region_orders",
    "sql_scalar_above_nation_avg",
    "text_bigram_topk",
    "text_idf_topk",
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_pairs",
    "tpch_q12_late_priority",
    "tpch_q13_custdist",
    "tpch_q14_promo_revenue_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive_pred",
    "tpch_q20_excess_inventory",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_global_sales_opportunity",
]


def _merge(attr: str) -> dict:
    out: dict = {}
    for mod in _MODULES:
        d = getattr(mod, attr, {})
        dup = set(out) & set(d)
        if dup:
            raise ValueError(f"duplicate registry keys across modules: {dup}")
        out.update(d)
    return out


def queries() -> dict[str, QueryFn]:
    merged = _merge("QUERIES")
    missing = [k for k in _SAMPLE_PRIORITY if k not in merged]
    if missing:
        raise ValueError(f"sample-priority keys not in registry: {missing}")
    out = {k: merged[k] for k in _SAMPLE_PRIORITY}
    out.update(merged)  # remaining keys keep module merge order
    return out


def oracle_sql() -> dict[str, str]:
    oracles = _merge("ORACLE")
    qs = queries()
    missing = set(oracles) - set(qs)
    if missing:
        raise ValueError(f"oracle without a query: {missing}")
    return oracles
