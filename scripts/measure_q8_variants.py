"""Reproduce the q8 single-node join-strategy study recorded in
BASELINE.md "100x record corrected": component floors, then the fact-fact
join strategies (gated broadcast / shuffled-hash / sort-merge shuffle),
each best-of-3 on FRESH plans, plus the DuckDB oracle time on the same
data — one process, nothing else running, is the valid protocol.

Usage: python scripts/measure_q8_variants.py [data_dir]
(default .bench_sf3x at its current replication)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.numerics import (  # noqa: E402
    _nearest_long_away,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.plan_cache import (  # noqa: E402
    clear_plan_memo,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table  # noqa: E402
from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.tpch_analytics import (  # noqa: E402
    ORACLE,
    _revenue,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark  # noqa: E402

D = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_sf3x"
)

spark = get_spark()
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "true")


def pieces():
    li = read_table(spark, D, "lineitem")
    orders = read_table(spark, D, "orders")
    cust = read_table(spark, D, "customer")
    supp = read_table(spark, D, "supplier")
    n_c = read_table(spark, D, "nation").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    region = read_table(spark, D, "region").filter(F.col("r_name") == "ASIA")
    n_s = read_table(spark, D, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    supp_flag = supp.join(n_s, supp.s_nationkey == F.col("snk")).select(
        "s_suppkey", (F.col("supp_nation") == "NATION_1").alias("tgt")
    )
    asia = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_c), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(region), F.col("crk") == region.r_regionkey)
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    lif = li.join(F.broadcast(supp_flag), li.l_suppkey == F.col("s_suppkey")).select(
        "l_orderkey", _nearest_long_away(_revenue() * 10_000).alias("r"), "tgt"
    )
    return asia, lif


def q8(strategy: str):
    asia, lif = pieces()
    if strategy == "broadcast":
        asia = F.broadcast(asia)
    elif strategy == "shuffle_hash":
        asia = asia.hint("SHUFFLE_HASH")
    elif strategy == "sort_merge":
        asia = asia.hint("MERGE")
    num = (
        F.sum(F.when(F.col("tgt"), F.col("r")).otherwise(F.lit(0).cast("long")))
        / 10_000.0
    )
    den = F.sum("r") / 10_000.0
    return (
        lif.join(asia, lif.l_orderkey == asia.o_orderkey)
        .groupBy("o_year")
        .agg(
            F.round(num / den, 6).alias("mkt_share"),
            F.round(den, 4).alias("total_revenue"),
        )
        .orderBy("o_year")
    )


def best_of(fn, n=3):
    fn().collect()  # warm IO/JIT outside the timed runs
    best = 1e9
    for _ in range(n):
        clear_plan_memo()
        df = fn()
        t = time.time()
        df.collect()
        best = min(best, time.time() - t)
    return round(best, 3)


print(f"component_floor lineitem_flag_agg_sec="
      f"{best_of(lambda: pieces()[1].agg(F.sum('r'), F.count(F.lit(1))))}")
print(f"component_floor asia_chain_agg_sec="
      f"{best_of(lambda: pieces()[0].agg(F.count(F.lit(1))))}")
for s in ("broadcast", "shuffle_hash", "sort_merge"):
    print(f"q8_{s}_sec={best_of(lambda: q8(s))}")

import duckdb  # noqa: E402

con = duckdb.connect()
for t in ("lineitem", "orders", "customer", "nation", "region", "supplier"):
    p = f"{D}/{t}.parquet"
    src = p + "/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
best = 1e9
for _ in range(3):
    t0 = time.time()
    con.execute(ORACLE["tpch_q8_market_share"]).fetchall()
    best = min(best, time.time() - t0)
print(f"duckdb_q8_sec={round(best, 3)}")
