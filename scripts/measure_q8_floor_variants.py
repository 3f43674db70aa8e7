"""Round-12: where does the 30x q8 lineitem-side floor (0.40 s cached)
go, and can a different input posture beat it?

Variants of the lineitem flag+agg floor and full q8 (broadcast, AQE off):
  a) cached via cache_tables (bench posture)
  b) direct parquet scan (10 files, OS page cache warm)
  c) cached with in-memory columnar compression OFF
Usage: python scripts/measure_q8_floor_variants.py [data_dir]
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
    clear_table_cache,
    read_table,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.tpch_analytics import (  # noqa: E402
    _q8_aggregate,
    _q8_sides,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
D = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, ".bench_sf3x")
RUNS = 5

spark = get_spark()
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "false")


def floor_df():
    li = read_table(spark, D, "lineitem")
    orders = read_table(spark, D, "orders")
    return _q8_sides(spark, D, li, orders)[0].agg(
        F.sum("r"), F.count(F.lit(1))
    )


def q8_df():
    li = read_table(spark, D, "lineitem")
    orders = read_table(spark, D, "orders")
    lif, asia = _q8_sides(spark, D, li, orders)
    return _q8_aggregate(
        lif.join(F.broadcast(asia), lif.l_orderkey == asia.o_orderkey)
    )


def timed(mk, runs=RUNS):
    mk().toPandas()
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


def report(tag):
    m, sp = timed(floor_df)
    print(f"{tag} floor: {m} {sp}", flush=True)
    m, sp = timed(q8_df)
    print(f"{tag} q8:    {m} {sp}", flush=True)


# (b) direct parquet first (nothing cached yet)
clear_table_cache()
spark.catalog.clearCache()
report("parquet-direct")

# (a) bench cache posture
cache_tables(spark, D, tables=("orders", "lineitem", "customer", "nation"),
             max_partitions=32)
report("cached-compressed")

# (c) uncompressed cache
clear_table_cache()
spark.catalog.clearCache()
spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
cache_tables(spark, D, tables=("orders", "lineitem", "customer", "nation"),
             max_partitions=32)
report("cached-uncompressed")
