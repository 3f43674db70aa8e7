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
# Round-9 rotation: every r8-recorded key pruned (50/50 green rows in
# CORRECTNESS_r08). Leads with (a) the FOUR keys the over-capacity r8
# list displaced past slot 50 (green r7 rows, but skipped a round),
# (b) the operators NEW or semantically changed this round (the
# bucketed-at-rest q8 variant; scalar_try_functions' widened try_cast
# prefix actually exercises int32 overflow now — output changed, needs
# a fresh row), then (c) oldest evidence first: the r3 keys and the
# r4 block that predates the round-4 per-row-rounding convention. The
# r4 tail past slot 50 rolls into round 10; prune recorded keys then.
_SAMPLE_PRIORITY = [
    # displaced past slot 50 by the r8 rotation — green r7 rows, oldest
    # debt first
    "window_trailing_range_frame",
    "multimodal_frame_sample",
    "sessionize_batch",
    "stream_dedup_keys",
    # new or output-changed in round 9 — no current driver row
    "tpch_q8_bucketed",
    "scalar_try_functions",
    "sim_search_ann_ivf_kmeans_exact",
    "dedup_simhash_planted",
    "join_cbo_stats_broadcast",
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
