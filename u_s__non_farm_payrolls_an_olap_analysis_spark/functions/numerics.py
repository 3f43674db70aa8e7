"""Deterministic numeric aggregation helpers.

Parallel double summation is order-dependent: at 100 TB a SUM over doubles
returns a slightly different last bit on every run (partition count, AQE
coalescing, and task scheduling all change accumulation order), which breaks
value-hash comparison against any single-threaded oracle and makes runs
non-reproducible. The engine therefore aggregates money-like measures in
DECIMAL — exact, associative, order-independent — and casts back to DOUBLE
for the result surface. Overhead is negligible next to shuffle cost, and the
same discipline is what production Spark pipelines use for financial sums.

Each helper has a DuckDB-SQL twin (``*_SQL``) so oracle queries share the
exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 4 fractional digits, 14 integral digits: enough for price sums at sf1000.
_DEC = "decimal(18,4)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM of a money-like double (exact decimal inside)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({expr}))"
