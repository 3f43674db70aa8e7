"""Incremental materialized-view maintenance (batch twin of the
foreachBatch upsert sink).

At 100 TB nobody recomputes a monthly-revenue rollup from scratch when a
day of orders lands: the scalable shape is an **additive-monoid MV** —
persist per-group PARTIALS (count + scaled-int64 sum, both associative
and order-independent), scan ONLY the delta, and fold its partials into
the stored state with one small keyed merge. The refresh cost is
O(delta + |MV|), independent of the base-table size; correctness is
provable because scaled-int partials merge exactly under any grouping
split (the same monoid argument as ``stream_upsert_foreach_batch``,
streaming/stateful.py).

The reference recomputes its aggregate dashboard from the full frame on
every run (`dashboard_nfp.py:44-63` — eager pandas, no incremental
notion); this module is the engine-side answer. The MV state is
materialized once per (session, sf_dir) like the other derived layouts
(layout.py memo pattern); the DuckDB oracle recomputes the SAME answer
from the full table, so the parity gate proves delta-folding ==
full-recompute.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numerics import SCALE, dsum_scaled, dsum_sql
from ..functions.timeparts import month_start
from ..io import read_table
from .layout import _derived_path

# Everything strictly BEFORE the cutoff is "already in the MV"; the delta
# scan carries the sargable raw-column predicate (>= cutoff) so at scale
# it prunes to the new partitions only.
MV_CUTOFF = "2000-01-01"

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ms", T.TimestampType()),
        T.StructField("n_orders", T.LongType()),
        T.StructField("total_scaled", T.LongType()),
    ]
)


def _monthly_partials(orders: DataFrame) -> DataFrame:
    """Per-month additive partials: (count, scaled-int64 sum). NOT
    descaled — partials must merge exactly as longs."""
    return orders.groupBy(month_start("o_orderdate").alias("ms")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum_scaled("o_totalprice").alias("total_scaled"),
    )


def _mv_state(
    spark: SparkSession, sf_dir: str, cutoff: str = MV_CUTOFF
) -> DataFrame:
    """The stored MV: monthly partials over the pre-cutoff base, written
    once per session+sf_dir+cutoff (the path carries the cutoff so the
    invariance test can build states at several cutoffs side by side).
    Read back with an explicit schema — an empty base writes no parquet
    footers (layout.py has the same guard)."""
    d = _derived_path(sf_dir, f"mv_monthly_state_{cutoff.replace('-', '')}")
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        base = read_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
        )
        _monthly_partials(base).write.mode("overwrite").parquet(d)
    return spark.read.schema(_STATE_SCHEMA).parquet(d)


def mv_incremental_refresh(
    spark: SparkSession, sf_dir: str, cutoff: str = MV_CUTOFF
) -> DataFrame:
    """North-star — monthly revenue after folding the post-cutoff delta
    into the stored MV partials: one delta scan (sargable ``>= cutoff``),
    one union + keyed re-aggregate over MV-sized data, one descale at the
    end. The oracle recomputes from the FULL table — hash equality is the
    proof that incremental maintenance changes cost, not semantics (and
    tests/test_incremental.py proves the answer is invariant to WHERE the
    base/delta split falls, the defining property of a correct
    incremental fold)."""
    state = _mv_state(spark, sf_dir, cutoff)
    delta = _monthly_partials(
        read_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp")
        )
    )
    merged = (
        state.unionByName(delta)
        .groupBy("ms")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_scaled").alias("total_scaled"),
        )
    )
    return merged.select(
        F.col("ms").alias("month_start"),
        "n_orders",
        F.round(
            F.col("total_scaled").cast("double") / float(SCALE), 4
        ).alias("total"),
    ).orderBy("month_start")


QUERIES = {
    "mv_incremental_refresh": mv_incremental_refresh,
}

ORACLE = {
    "mv_incremental_refresh": (
        "SELECT date_trunc('month', o_orderdate) AS month_start, "
        "COUNT(*) AS n_orders, "
        f"ROUND({dsum_sql('o_totalprice')}, 4) AS total "
        "FROM orders GROUP BY 1 ORDER BY 1"
    ),
}
