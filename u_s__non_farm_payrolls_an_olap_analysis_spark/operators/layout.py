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


# --- Z-order (Morton) clustering: multi-dimensional data skipping --------
#
# Directory partitioning prunes on ONE dimension. When queries slice on
# two (customer range x date range), the 100 TB answer is Z-ORDER
# clustering: interleave the bits of both bucketed dimensions into one
# sort key, range-partition + sort files by it, and parquet footer
# min/max stats on BOTH raw columns become tight per file — a 2-D box
# predicate then skips most files (the technique behind Delta/Iceberg
# OPTIMIZE ZORDER, built here from plain Catalyst bit expressions).
# tests/test_scale_patterns.py measures the skip rate against a
# natural-order layout via the actual parquet footers.

ZORDER_BITS = 8  # 256 buckets/dim — widen for deeper key spaces at scale
ZORDER_CUST_DIV = 64  # bucket width in customer keys
ZORDER_DAY_DIV = 32  # bucket width in days
ZORDER_EPOCH = "1995-01-01"


def _morton16(c, d):
    """Interleave two ZORDER_BITS-bit bucket ids into one Z-value —
    pure shift/and/or Catalyst expressions, codegen'd per row."""
    z = F.lit(0)
    for i in range(ZORDER_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(d, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zorder_keyed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with Z-order key columns (shared by the registry query and
    the clustering writer)."""
    orders = read_table(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"),
        F.lit(ZORDER_EPOCH).cast("date"),
    )
    mask = (1 << ZORDER_BITS) - 1
    cb = F.expr(f"(o_custkey div {ZORDER_CUST_DIV})").bitwiseAND(F.lit(mask))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        day.cast("int").alias("day_num"),
        cb.cast("int").alias("cust_bucket"),
    ).withColumn(
        "day_bucket",
        F.expr(f"(day_num div {ZORDER_DAY_DIV})")
        .bitwiseAND(F.lit(mask))
        .cast("int"),
    ).withColumn(
        "zkey", _morton16(F.col("cust_bucket"), F.col("day_bucket")).cast("int")
    )


def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — the Z-order key projection itself, oracle-checked bit
    for bit (the clustering write is deterministic only up to file
    assignment, so the KEY is the hash-checked contract; the skip-rate
    benefit is measured in tests over real parquet footers)."""
    return zorder_keyed_orders(spark, sf_dir).select(
        "o_orderkey", "cust_bucket", "day_bucket", "zkey"
    )


def _zorder_morton_sql() -> str:
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"(((cust_bucket >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((day_bucket >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


QUERIES["layout_zorder_key"] = layout_zorder_key

ORACLE["layout_zorder_key"] = (
    "WITH b AS (SELECT o_orderkey, "
    f"CAST((o_custkey // {ZORDER_CUST_DIV}) & {(1 << ZORDER_BITS) - 1} "
    "AS INT) AS cust_bucket, "
    f"CAST((date_diff('day', DATE '{ZORDER_EPOCH}', "
    f"CAST(o_orderdate AS DATE)) // {ZORDER_DAY_DIV}) "
    f"& {(1 << ZORDER_BITS) - 1} AS INT) AS day_bucket "
    "FROM orders) "
    "SELECT o_orderkey, cust_bucket, day_bucket, "
    f"CAST({_zorder_morton_sql()} AS INT) AS zkey FROM b"
)
