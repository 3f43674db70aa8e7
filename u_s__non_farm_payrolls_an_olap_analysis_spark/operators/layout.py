"""Partitioned-at-rest layout variants (SURVEY §7.3 "100 TB posture").

The reference stores one unpartitioned table (`etl.py:58-63`). At 100 TB
the single most important storage decision is the partition layout: a
year-partitioned fact table lets every time-sliced query prune whole
directories before a single byte is read (static partition pruning — the
`PartitionFilters` entry in the scan node, asserted in
`tests/test_plans.py`).

The partitioned copy is materialized once per (session, sf_dir) into a
temp directory (same memo pattern as the streaming source) — the test
fixtures are read-only, so the layout variant lives beside them. Results
are identical to the unpartitioned scan by construction; the DuckDB oracle
reads the ORIGINAL parquet, so the parity gate proves layout does not
change semantics.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numerics import dsum, dsum_sql
from ..io import read_table

_PART_DIR_MEMO: dict[tuple[str, str], str] = {}

# One private mkdtemp base per process, removed at interpreter exit (same
# lifecycle as streaming's drain dir). A fixed predictable path in shared
# /tmp would let concurrent runs on the same sf_dir race each other's
# overwrite (and is the classic pre-creatable-tempfile pattern); mkdtemp
# is per-process-private, and atexit bounds the leak to crashed runs.
_LAYOUT_BASE: str | None = None


def _layout_dir(sf_dir: str) -> str:
    global _LAYOUT_BASE
    if _LAYOUT_BASE is None or not os.path.exists(_LAYOUT_BASE):
        _LAYOUT_BASE = tempfile.mkdtemp(prefix="layout_")
        atexit.register(shutil.rmtree, _LAYOUT_BASE, ignore_errors=True)
    # basename alone collides when two distinct sf_dirs share a leaf name
    # (e.g. /a/sf0.01 and /b/sf0.01) — the second write would overwrite the
    # first while the memo still serves it. Key by basename + abspath hash.
    ap = os.path.abspath(sf_dir)
    tag = f"{os.path.basename(ap)}_{hashlib.md5(ap.encode()).hexdigest()[:12]}"
    return os.path.join(_LAYOUT_BASE, f"orders_by_year_{tag}")


def partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-partitioned copy of ``orders`` (directory layout
    ``o_year=<y>/part-*.parquet``), built once per session+sf_dir."""
    key = (spark.sparkContext.applicationId, sf_dir)
    with_year = read_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    d = _PART_DIR_MEMO.get(key)
    if d is None or not os.path.exists(d):
        d = _layout_dir(sf_dir)
        with_year.write.mode("overwrite").partitionBy("o_year").parquet(d)
        _PART_DIR_MEMO[key] = d
    # explicit schema: an EMPTY source writes only _SUCCESS (no footers), and
    # schema inference on that raises — a real failure mode for pruned-to-
    # nothing intermediate tables at scale. The schema is known; state it.
    return spark.read.schema(with_year.schema).parquet(d)


def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly totals for two years off the partitioned layout: the year
    predicate is a pure partition filter — non-matching years are never
    opened. The same query on the flat table reads every row group and
    relies on row-group stats instead."""
    po = partitioned_orders(spark, sf_dir)
    return (
        po.filter(F.col("o_year").isin(1997, 1998))
        .groupBy(F.col("o_year").cast("int").alias("year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(dsum("o_totalprice"), 4).alias("total"),
        )
        .orderBy("year")
    )


QUERIES = {
    "scan_partition_pruned": scan_partition_pruned,
}

ORACLE = {
    "scan_partition_pruned": (
        "SELECT CAST(year(o_orderdate) AS INT) AS year, "
        "COUNT(*) AS n_orders, "
        f"ROUND({dsum_sql('o_totalprice')}, 4) AS total "
        "FROM orders WHERE year(o_orderdate) IN (1997, 1998) "
        "GROUP BY 1 ORDER BY 1"
    ),
}
