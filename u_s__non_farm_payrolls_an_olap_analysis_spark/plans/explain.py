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


def join_kinds(df: DataFrame) -> list[str]:
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        formatted_plan(df),
    )


def exchange_count(df: DataFrame) -> int:
    """Number of distinct shuffle boundaries. Formatted explain prints each
    node twice (tree line 'Exchange (5)' + detail header '(5) Exchange'),
    so count unique node ids, not text occurrences."""
    plan = formatted_plan(df)
    # BroadcastExchange is a broadcast, not a shuffle — exclude it
    ids = set(re.findall(r"(?<!Broadcast)Exchange \((\d+)\)", plan))
    ids |= set(re.findall(r"\((\d+)\) Exchange", plan))
    return len(ids)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)
