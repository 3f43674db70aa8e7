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
# Round-12 rotation: all 50 keys recorded in CORRECTNESS_r11.json pruned.
# Leads with timeseries_holt_linear — the ONLY registry key with zero
# driver rows across 11 rounds (added round 10, oracle fixed round 11,
# never sampled because it was left out of this list; round-11 VERDICT
# item 1). New round-12 keys slot in directly after it (a new key has
# no driver row anywhere, so it outranks every key with historical
# evidence). Then the r4-evidence quartet and the r6 tail (TPC-H block,
# sql_dashboard, sources, r3-era joins/aggregates); with holt at the
# head the last two TPC-H keys (q21/q22, r6 rows) roll to round 13 —
# prune the r12-recorded keys then and lead with that remainder.
_SAMPLE_PRIORITY = [
    # NEW round 10, never sampled; oracle repaired round 11 — the only
    # key with no driver CORRECTNESS row in 11 rounds. First in line.
    "timeseries_holt_linear",
    # NEW in round 12 — binary sign quantization + Hamming top-k
    "sim_search_hamming_binary",
    # NEW in round 12 — classical additive seasonal decomposition
    "timeseries_classical_decompose",
    # NEW in round 12 — product-quantization ADC search (PAMI'11)
    "sim_search_pq_adc",
    # NEW in round 12 — tabular CUSUM change-point detection (Page'54)
    "timeseries_cusum_changepoints",
    # NEW in round 12 — zero-exchange sessionize off user-bucketed layout
    "sessionize_batch_clustered",
    # NEW in round 12 — co-purchase connected components (min-label CC)
    "graph_connected_components",
    # NEW in round 12 — MATCH_RECOGNIZE-style view-click*-purchase runs
    "events_pattern_match",
    # NEW in round 12 — interpolated Kneser-Ney bigram LM scoring
    "quality_kneser_ney_logprob",
    # NEW in round 12 — Holt-Winters additive seasonal smoothing
    "timeseries_holt_winters",
    # NEW in round 12 — streaming CEP twin of events_pattern_match
    "stream_pattern_match",
    # NEW in round 12 — Theil-Sen robust trend (median of pair slopes)
    "agg_theil_sen_trend",
    # NEW in round 12 — MAD robust outlier detection per event type
    "dq_anomaly_mad",
    # NEW in round 12 — systematic (low-variance) weighted resampling
    "sample_systematic_resample",
    # NEW in round 12 — per-source Shannon entropy / Pielou evenness
    "corpus_entropy_by_source",
    # NEW in round 12 (session 2) — k-NN majority-vote classification
    "sim_knn_classify",
    # latest driver row r4 — oldest surviving evidence
    "udtf_month_spine",
    "unpivot_measures",
    "window_distribution_ranks",
    "window_first_last_nth",
    # latest driver row r6 — the remaining tail, in r6 order
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
