"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on a warm local SparkSession.

Protocol (BASELINE.md): steady-state per-query wall time INCLUDING result
fetch, warm JVM + warm inputs — one untimed warm-up pass per query, then
median of 3 timed runs. Cold JVM start is excluded (reported separately as
"startup_sec"). Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# BASELINE.md metric name -> registry query key
HEADLINE = {
    "slice_avg_by_year": "slice_avg_by_year",
    "slice_filter_year_month": "filter_in_and_between",
    "dice_mom_drop": "filter_threshold",
    "rollup_quarter_qoq": "rollup_quarter_qoq",
    "drill_top_year_detail": "top1_by_metric",
    "join_agg_pricing": "join_agg_pricing",
    "join_3way": "join_shuffle_3way",
    "window_rank": "window_rank_topk_per_group",
    "events_sessionish": "events_sessionish",
    "decade_case": "rollup_decade_avg",
}

RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None  # informational only — don't die on unconventional paths

    t0 = time.time()
    from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark
    from u_s__non_farm_payrolls_an_olap_analysis_spark import registry

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    startup = time.time() - t0

    qs = registry.queries()
    results: dict[str, float] = {}
    for name, key in HEADLINE.items():
        fn = qs[key]
        fn(spark, sf_dir).toPandas()  # warm-up: file listing, code paths
        times = []
        for _ in range(RUNS):
            t = time.time()
            fn(spark, sf_dir).toPandas()  # Arrow result fetch
            times.append(time.time() - t)
        results[name] = round(statistics.median(times), 4)

    total = round(sum(results.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_warm",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
                "startup_sec": round(startup, 2),
                "runs_per_query": RUNS,
            }
        )
    )


if __name__ == "__main__":
    main()
