"""Reshape operators: pivot / unpivot (melt).

The reference renders year-over-year comparison tables by hand in the
dashboard; ``groupBy().pivot()`` is the engine form. The pivot column
values are passed EXPLICITLY — at 100 TB an implicit pivot first runs a
distinct scan over the pivot column; with explicit values the plan is a
single pass (one hash aggregate with one conditional agg per value), which
is also what keeps the output schema deterministic for the oracle.

Unpivot is the inverse (``DataFrame.unpivot``): wide metric columns to
(key, metric, value) rows — the normalization step before generic
per-metric pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numerics import dsum, dsum_sql
from ..functions.timeparts import month_of, year_of
from ..io import read_table

PIVOT_YEARS = [1995, 1996, 1997, 1998]


def pivot_month_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Months as rows, years as columns, order totals as cells — the
    dashboard's YoY comparison table as one pivoted aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select(
            month_of("o_orderdate").alias("month"),
            year_of("o_orderdate").alias("year"),
            "o_totalprice",
        )
        .filter(F.col("year").isin(*PIVOT_YEARS))
        .groupBy("month")
        .pivot("year", PIVOT_YEARS)
        .agg(F.round(dsum("o_totalprice"), 4))
        .toDF("month", *[f"y{y}" for y in PIVOT_YEARS])
    )


def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt per-year wide measures back to long (metric, value) rows."""
    wide = pivot_month_by_year(spark, sf_dir)
    return wide.unpivot(
        ids=["month"],
        values=[f"y{y}" for y in PIVOT_YEARS],
        variableColumnName="year_col",
        valueColumnName="total",
    )


def crosstab_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via ``df.stat.crosstab`` (the DataFrameStatFunctions
    surface): order status x priority counts. crosstab's column order is
    engine-internal, so the projection pins it explicitly — at any scale
    this is one pivot-style aggregate over two low-cardinality keys."""
    orders = read_table(spark, sf_dir, "orders")
    ct = orders.stat.crosstab("o_orderstatus", "o_orderpriority")
    cols = [
        "1-URGENT",
        "2-HIGH",
        "3-MEDIUM",
        "4-NOT SPECIFIED",
        "5-LOW",
    ]
    return ct.select(
        F.col("o_orderstatus_o_orderpriority").alias("status"),
        *[F.col(f"`{c}`").alias(f"p{i + 1}") for i, c in enumerate(cols)],
    ).orderBy("status")


QUERIES = {
    "crosstab_status_priority": crosstab_status_priority,
    "pivot_month_by_year": pivot_month_by_year,
    "unpivot_measures": unpivot_measures,
}

_CELL = {
    y: dsum_sql(f"CASE WHEN year(o_orderdate) = {y} THEN o_totalprice END")
    for y in PIVOT_YEARS
}

_PIVOT_SQL = (
    "SELECT CAST(month(o_orderdate) AS INT) AS month, "
    + ", ".join(f"ROUND({_CELL[y]}, 4) AS y{y}" for y in PIVOT_YEARS)
    + " FROM orders WHERE CAST(year(o_orderdate) AS INT) IN "
    + "(" + ", ".join(str(y) for y in PIVOT_YEARS) + ") GROUP BY 1"
)

ORACLE = {
    "crosstab_status_priority": (
        "SELECT o_orderstatus AS status, "
        "CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS p1, "
        "CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS p2, "
        "CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS p3, "
        "CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 "
        "ELSE 0 END) AS BIGINT) AS p4, "
        "CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS p5 "
        "FROM orders GROUP BY 1 ORDER BY 1"
    ),
    "pivot_month_by_year": _PIVOT_SQL,
    "unpivot_measures": (
        f"WITH w AS ({_PIVOT_SQL}) "
        + " UNION ALL ".join(
            f"SELECT month, 'y{y}' AS year_col, y{y} AS total FROM w"
            for y in PIVOT_YEARS
        )
    ),
}
