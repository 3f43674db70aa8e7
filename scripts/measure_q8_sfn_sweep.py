"""Round-12 sweep of the 30x q8 valley (BENCH_r11: tpch_q8_market_share
2.99x vs DuckDB — the only >2x reading at any measured scale point).

Replicates bench.py's _sfn_section conditions exactly (cache_tables over
the same .bench_sf3x dir, fresh plan per timed run, median of 5) and
sweeps shuffle partitions x AQE x fact-join strategy, plus component
floors so the residual can be pinned to scheduling floor vs data path.

Usage: python scripts/measure_q8_sfn_sweep.py [data_dir]
Must be the only Spark session on the host (CLAUDE.md rule 6b).
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.plan_cache import (  # noqa: E402
    clear_plan_memo,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.io import (  # noqa: E402
    cache_tables,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.tpch_analytics import (  # noqa: E402
    _q8_aggregate,
    _q8_sides,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table  # noqa: E402
from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
D = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, ".bench_sf3x")
RUNS = 5

spark = get_spark()
cache_tables(
    spark, D,
    tables=("orders", "lineitem", "customer", "nation"),
    max_partitions=32,
)


def q8(strategy: str):
    li = read_table(spark, D, "lineitem")
    orders = read_table(spark, D, "orders")
    lif, asia = _q8_sides(spark, D, li, orders)
    if strategy == "broadcast":
        asia = F.broadcast(asia)
    elif strategy == "shuffle_hash":
        asia = asia.hint("SHUFFLE_HASH")
    return _q8_aggregate(lif.join(asia, lif.l_orderkey == asia.o_orderkey))


def timed(mk, runs=RUNS):
    mk().toPandas()  # warm
    times = []
    for _ in range(runs):
        clear_plan_memo()
        df = mk()
        t = time.time()
        df.toPandas()
        times.append(time.time() - t)
    return round(statistics.median(times), 4), [
        round(min(times), 4), round(max(times), 4)
    ]


# component floors under the current bench posture (16 parts, AQE on)
spark.conf.set("spark.sql.shuffle.partitions", "16")
spark.conf.set("spark.sql.adaptive.enabled", "true")
m, sp = timed(lambda: _q8_sides(
    spark, D, read_table(spark, D, "lineitem"), read_table(spark, D, "orders")
)[0].agg(F.sum("r"), F.count(F.lit(1))))
print(f"floor lineitem_flag_agg: {m} {sp}")
m, sp = timed(lambda: _q8_sides(
    spark, D, read_table(spark, D, "lineitem"), read_table(spark, D, "orders")
)[1].agg(F.count(F.lit(1))))
print(f"floor asia_chain_agg: {m} {sp}")

for parts in (8, 16, 32):
    for aqe in ("true", "false"):
        for strat in ("broadcast", "shuffle_hash"):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            m, sp = timed(lambda: q8(strat))
            print(f"parts={parts} aqe={aqe} {strat}: {m} {sp}", flush=True)
