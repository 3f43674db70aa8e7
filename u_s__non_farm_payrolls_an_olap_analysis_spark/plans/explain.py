"""Plan-inspection utilities: assert the physical properties that make
queries scale (SURVEY §4.2) instead of hoping for them.

Used by tests to pin: filters reaching the Parquet scan (PushedFilters),
column pruning (ReadSchema), broadcast joins on dims, TakeOrderedAndProject
for top-k, and shuffle (Exchange) counts. A plan regression — e.g. a filter
silently becoming non-sargable — fails CI rather than surfacing as a 100x
slowdown on the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    return re.findall(r"PushedFilters: \[(.*?)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — what actually gets decoded from Parquet."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def _node_occurrences(plan: str, node: str) -> set[str]:
    """Unique node ids for a physical node name. Formatted explain prints
    each node twice (tree line 'Name (5)' + detail header '(5) Name'), and
    node names embed each other ('ReusedExchange' contains 'Exchange') —
    match whole names only and dedupe by id."""
    ids = set(re.findall(rf"(?<![A-Za-z]){node} \((\d+)\)", plan))
    ids |= set(re.findall(rf"\((\d+)\) {node}(?![A-Za-z])", plan))
    return ids


def join_kinds(df: DataFrame) -> list[str]:
    """Join strategy per distinct join node (deduped by node id)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for kind in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        out.extend([kind] * len(_node_occurrences(plan, kind)))
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of distinct shuffle boundaries — bare Exchange nodes only
    (BroadcastExchange is a broadcast; ReusedExchange reuses an existing
    exchange output and adds no shuffle)."""
    return len(_node_occurrences(formatted_plan(df), "Exchange"))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)
