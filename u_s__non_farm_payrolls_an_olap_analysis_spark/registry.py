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
    joins,
    json_ops,
    layout,
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
    stateful,
]


# Keys the round-5 driver sample MUST cover: every registry key with no
# CORRECTNESS row in any round 1-4 (computed against the r1-r4 JSONs),
# ordered first explicitly so module insertion order can't push one out
# of the 50-key window. queries() emits these first, then the _MODULES
# merge order. Guarded by tests/test_registry_contract.py (priority keys
# must exist) — remove entries as rounds record their rows.
# Round-7 rotation (CLAUDE.md rule 7): all 31 round-5/6-recorded keys
# pruned (their green rows live in CORRECTNESS_r05/r06). This round leads
# with (a) the two streaming paths whose code changed this round (ts-unit
# fix in _events_stream + the stateful last_ts repair — their previous
# rows predate both the fix and the testdata's ns→µs switch), (b) the
# new operators (production-geometry embedding LSH, multimodal resize),
# and (c) the 45 keys whose latest driver row is r1–r3, i.e. BEFORE the
# round-4 per-row-rounding convention — oldest evidence first. Deferred
# to round 8: scan_table, cache_result, project_rename (implicitly
# exercised by every other query), scan_partition_pruned (r3, pushed to
# slot 51 by the round-7 additions), and the remaining r4-rowed stream
# windows (sliding, session, dedup_keys — same decode path as tumbling,
# all green locally).
_SAMPLE_PRIORITY = [
    # changed/new this round — need fresh driver rows
    "stream_stateful_user_profile",
    "stream_tumbling_agg",
    "stream_stream_join",
    "dedup_embedding_cosine_prod",  # rows-only by design: gets its row
    "multimodal_resize_stub",
    # latest driver row r1
    "agg_approx_count_distinct",
    "window_rank_topk_per_group",
    "window_rank_variants",
    "join_agg_pricing",
    "events_sessionish",
    "agg_custom_udaf_geomean",
    "agg_percentiles",
    "agg_corr_covar",
    "window_moving_stats",
    "agg_approx_percentiles",
    "agg_histogram",
    "string_functions_showcase",
    "null_handling_showcase",
    "timeseries_gap_fill",
    # latest driver row r3
    "sample_by_key_mod",
    "split_train_test",
    "sample_stratified_rates",
    "agg_bitmap_distinct",
    "agg_hll_sketch_merge",
    "project_cast",
    "filter_in_and_between",
    "filter_threshold",
    "filter_month_in",
    "filter_eq_year",
    "filter_dropna",
    "filter_theta_range",
    "slice_avg_by_year",
    "rollup_quarter_sum",
    "rollup_year_sum",
    "rollup_decade_avg",
    "dice_q4_avg_by_month",
    "scalar_max",
    "scalar_min",
    "argmax_argmin",
    "window_pct_change_global",
    "window_pct_change_partitioned",
    "window_diff_on_agg",
    "rollup_quarter_qoq",
    "window_running_max",
    "sort_by_time",
    "limit_head",
    "top1_by_metric",
    "drill_sharpest_drop",
    "dice_recovery_asof",
    "lookup_scalar",
    "scan_partition_pruned",
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
