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
# Round-8 rotation: all round-7-recorded keys pruned (green rows in
# CORRECTNESS_r07). Leads with (a) the operators NEW this round
# (llm_prep pack incl. pack_training_sequences, layout_zorder_key,
# text_pmi_collocations, the streaming crawl-dedup and foreachBatch
# upsert, DPP + bucketed + bitmap join demonstrators, the planted-LSH
# oracle twin, the cluster-size histogram), (b) the 8 keys whose decode
# or plan changed this round (tz-independent event-time work: streaming
# sliding/session/dedup, sessionize_batch, join_interval_bucketed,
# window_trailing_range_frame, multimodal_frame_sample's batch guard;
# the q8 replan), then (c) oldest evidence first: the r3 keys and the
# r4 keys that predate the round-4 per-row-rounding convention. The
# list outgrew the 50-key window as late-round operators landed — the
# keys past slot 50 (a tail of the r4 block) roll into the round-9/10
# samples; prune recorded keys next round.
# Round-9 rotation TODO (written end of round 8): the window is over
# capacity — 46 keys with no driver row ever (every r8 addition) fill
# slots 1-46, four of the six r8-changed keys fill 47-50, and FOUR
# keys were displaced past slot 50: window_trailing_range_frame,
# multimodal_frame_sample, sessionize_batch, and stream_dedup_keys
# (all have green r7 rows AND passed this round's full-registry parity
# in BOTH session flavors, including the plain-session driver sim).
# Once CORRECTNESS_r08 lands: prune every recorded key, lead with
# those four displaced keys, then continue the r4-block rotation.
_SAMPLE_PRIORITY = [
    # new in round 8 — no driver row exists yet
    "stream_left_outer_join",
    "stream_full_outer_join",
    "sql_lateral_topk_per_group",
    "sql_recursive_month_spine",
    "corpus_shuffle_shards",
    "vocab_bpe_pair_counts",
    "norm_winsorize_clip",
    "agg_funnel_conversion",
    "retention_cohorts",
    "sink_python_datasource",
    "scan_schema_evolution",
    "layout_partition_overwrite_dynamic",
    "scalar_try_functions",
    "array_higher_order_funcs",
    "agg_linear_trend",
    "mv_incremental_refresh",
    "timeseries_interpolate_linear",
    "sample_domain_cap",
    "table_stats_collect",
    "cdc_read_asof",
    "dq_referential_integrity",
    "agg_weighted_percentile",
    "quality_unigram_surprisal",
    "join_asof_nearest",
    "pii_detect_stats",
    "pii_redact",
    "decontam_overlap",
    "quality_repetition_signals",
    "chunk_documents",
    "vocab_coverage",
    "layout_zorder_key",
    "stream_docs_dedup_fingerprint",
    "text_pmi_collocations",
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
    # changed in round 8 (tz-independent decode / q8 replan) — need fresh
    # driver rows first
    "tpch_q8_market_share",
    "join_interval_bucketed",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup_keys",
    "sessionize_batch",
    "window_trailing_range_frame",
    "multimodal_frame_sample",
    # latest driver row r3 (oldest remaining)
    "cache_result",
    "project_rename",
    "scan_partition_pruned",
    "scan_table",
    # latest driver row r4 — pre-rounding-convention rows; the driver takes
    # the first 50 keys, so the tail of this list rolls into round 10
    "agg_mode_deterministic",
    "array_explode_variants",
    "array_stats_by_label",
    "cogroup_asof_pandas",
    "crosstab_status_priority",
    "datetime_functions_showcase",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_incremental_new_docs",
    "dedup_minhash_near",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dq_checks",
    "grouped_map_normalize",
    "json_extract_props",
    "json_from_json_struct",
    "json_map_explode",
    "json_variant_ops",
    "multimodal_decode_meta",
    "multimodal_frame_stats",
    "pivot_month_by_year",
    "scalar_functions_showcase",
    "setop_multiset",
    "setop_union_except",
    "sim_search_ann_ivf",
    "sim_search_ann_ivf_kmeans",
    "sim_search_cosine",
    "str_format_display",
    "text_clean_funnel",
    "text_fingerprint",
    "text_fuzzy_match",
    "text_langid",
    "text_quality_score",
    "text_token_count",
    "text_tokenize_tf",
    "udf_decade_scalar_pandas",
    "udtf_month_spine",
    "unpivot_measures",
    "window_distribution_ranks",
    "window_first_last_nth",
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
