"""Round-12: candidate sfN-section posture check — all five sfN bench
queries + bucketed q8 under (32 parts, AQE off) vs the r11 posture
(16 parts, AQE on). Decides bench.py's _sfn_section settings.

Usage: python scripts/measure_q8_posture_final.py [data_dir]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from u_s__non_farm_payrolls_an_olap_analysis_spark import registry  # noqa: E402
from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.plan_cache import (  # noqa: E402
    clear_plan_memo,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.io import cache_tables  # noqa: E402
from u_s__non_farm_payrolls_an_olap_analysis_spark.operators import layout  # noqa: E402
from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
D = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, ".bench_sf3x")
RUNS = 5
KEYS = [
    "join_agg_pricing",
    "window_rank_topk_per_group",
    "tpch_q8_market_share",
    "tpch_q8_bucketed",
    "sessionize_batch",
]

spark = get_spark()
cache_tables(
    spark, D,
    tables=("orders", "lineitem", "events", "customer", "nation"),
    max_partitions=32,
)
layout._q8_bucketed_tables(spark, D)
qs = registry.queries()


def timed(fn):
    fn(spark, D).toPandas()
    times = []
    for _ in range(RUNS):
        clear_plan_memo()
        df = fn(spark, D)
        t = time.time()
        df.toPandas()
        times.append(time.time() - t)
    return round(statistics.median(times), 4), [
        round(min(times), 4), round(max(times), 4)
    ]


for parts, aqe in ((16, "true"), (32, "false"), (32, "true"), (16, "false")):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    print(f"--- parts={parts} aqe={aqe}", flush=True)
    for k in KEYS:
        m, sp = timed(qs[k])
        print(f"  {k}: {m} {sp}", flush=True)
