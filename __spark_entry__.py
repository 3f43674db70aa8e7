"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``u_s__non_farm_payrolls_an_olap_analysis_spark``
package; this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from u_s__non_farm_payrolls_an_olap_analysis_spark import registry
from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.olap import (
    slice_avg_by_year,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1 slice 0): yearly average order value —
    scan → hash aggregate → sort on sf0.001."""
    return slice_avg_by_year(spark, SMOKE_SF_DIR).orderBy("year")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return registry.oracle_sql()
