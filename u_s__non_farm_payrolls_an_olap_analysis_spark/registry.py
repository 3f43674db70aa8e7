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

# Merge order IS the driver's CORRECTNESS sample order (first 50 keys are
# hashed against their DuckDB oracles each round). The LLM-data-pipeline pack
# (dedup/similarity/text/multimodal/json/setops/custom-UDF/streaming) leads so
# those operators get driver-oracle rows; the olap/joins/tpch/layout/sql_api
# block already has green rows from rounds 1-3 and rotates to the tail.
_MODULES = [
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
    analytics,
    sampling,
    sketches,
    sources,
    aggregates,
    olap,
    joins,
    tpch_analytics,
    layout,
    sql_api,
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
