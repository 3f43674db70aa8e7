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
)
from .streaming import stateful, stream_windows

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    olap,
    joins,
    tpch_analytics,
    layout,
    sql_api,
    sampling,
    sketches,
    aggregates,
    analytics,
    custom_udf,
    setops,
    json_ops,
    text,
    dedup,
    similarity,
    multimodal,
    sources,
    scalars,
    reshape,
    stream_windows,
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
