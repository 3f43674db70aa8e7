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
    return _merge("QUERIES")


def oracle_sql() -> dict[str, str]:
    oracles = _merge("ORACLE")
    qs = queries()
    missing = set(oracles) - set(qs)
    if missing:
        raise ValueError(f"oracle without a query: {missing}")
    return oracles
