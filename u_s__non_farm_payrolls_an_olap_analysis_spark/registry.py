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
_SAMPLE_PRIORITY = [
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q20_excess_inventory",
    "tpch_q1_pricing_summary",
    "text_idf_topk",
    "text_bigram_topk",
    "corpus_mix_report",
    "embedding_quantize_int8",
    "dq_anomaly_zscore",
    "tpch_q18_large_volume",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q4_order_priority",
    "tpch_q13_custdist",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_pred",
    "tpch_q22_global_sales_opportunity",
    "tpch_q8_market_share",
    "tpch_q11_important_pairs",
    "tpch_q12_late_priority",
    "tpch_q16_supplier_distribution",
    "scd2_history_merge",
    "source_api_extract",
    "sink_jdbc_upsert",
    "sql_dashboard_q4_growth",
    "sql_dashboard_sharpest_drop",
    "sql_dashboard_decade_case",
    "join_skew_aqe",
    "join_full_outer_reconcile",
    "join_null_safe_eq",
    "agg_salted_two_phase",
    "agg_boolean_family",
    "stream_stateful_user_profile",  # rows-only by design: gets its row
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
