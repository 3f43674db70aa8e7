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
# Round-13 rotation: all 50 keys recorded in CORRECTNESS_r12.json pruned
# (the entire round-12 new-key batch plus holt got fresh green rows).
# What remains is the r6-evidence TPC-H tail that rolled past the window
# two rounds running; new round-13 keys slot in AHEAD of it (a new key
# has no driver row anywhere, so it outranks keys with historical
# evidence). Prune the r13-recorded keys next round.
_SAMPLE_PRIORITY = [
    # Round-15 rotation (VERDICT r14 item 1): the 50 keys recorded in
    # CORRECTNESS_r14.json are pruned (all green; they fall back to
    # module merge order). What remains is EXACTLY the 39 registry keys
    # with no driver CORRECTNESS row in ANY round r1-r14 (reproducible:
    # set(registry.queries()) - union of CORRECTNESS_r*.json keys), in
    # their prior relative order. All 39 fit the driver's 50-key window,
    # so after round 15 every registry key has a driver row; up to 11
    # NEW keys may append behind them this round and still be sampled.
    # Guarded by tests/test_registry_contract.py::test_sample_window_freshness.
    "agg_srm_assignment_check",
    "stream_interarrival_ewma",
    "agg_extreme_value_gumbel",
    "agg_mcnemar_yearly_activity",
    "events_bounce_rate_daily",
    "agg_capture_recapture_customers",
    "timeseries_theta_forecast",
    "events_markov_stationary",
    "agg_lorenz_curve_deciles",
    "text_js_divergence_by_source",
    "timeseries_durbin_watson",
    "agg_herfindahl_brand_hhi",
    "multimodal_phash_dedup",
    "timeseries_mann_kendall",
    "agg_decision_stump_gini",
    "sim_eval_ece",
    "events_conversion_latency_quantiles",
    "agg_price_index_laspeyres",
    "source_csv_roundtrip",
    "agg_odds_ratio_woolf",
    "agg_ipw_treatment_effect",
    "sql_asof_dialect_duckdb_native",
    "agg_wilson_score_ci",
    "text_mattr_diversity",
    "graph_pagerank_personalized",
    "dq_constraint_violations",
    "events_new_vs_returning",
    "sql_distinct_on_dialect",
    "privacy_randomized_response",
    "text_bigram_entropy_rate",
    "stream_daily_new_users",
    "agg_theil_atkinson_inequality",
    "window_peer_zscore",
    "events_sessions_per_user_hist",
    "window_rolling_sharpe",
    "timeseries_seasonal_subseries",
    "agg_coefficient_of_variation",
    "events_weekday_weekend_split",
    # NEW in round 14 — live embedded-Derby df.write.jdbc round-trip
    # (appended BEHIND the 88-key backlog: new keys wait their turn
    # while the never-sampled debt clears)
    "sink_jdbc_roundtrip_derby",
    # NEW in round 15 — ANN measured-recall harness (VERDICT r14 item 7):
    # appended BEHIND the backlog; with 39 backlog keys ahead they still
    # land inside the 50-key window this round.
    "sim_eval_recall_hamming",
    "sim_eval_recall_pq_adc",
    "sim_eval_recall_ivf",
    "sim_eval_recall_int8",
    # NEW in round 15 — resampling-inference family (Poisson bootstrap /
    # random-relabel permutation / delete-1 jackknife) + rolling corr;
    # 39 backlog + 8 new = 47 ≤ the 50-key window, all sampled this round
    "agg_bootstrap_ci",
    "agg_permutation_test",
    "agg_jackknife_ratio_variance",
    "window_rolling_corr",
    # NEW in round 15 (batch 3) — drift detection / experimentation:
    # 39 backlog + 11 new = EXACTLY the 50-key driver window
    "timeseries_page_hinkley",
    "agg_cuped_adjustment",
    "agg_tukey_hsd",
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
