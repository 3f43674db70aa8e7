"""Decompose the events_sessionish headline time (round-9 VERDICT item 5:
54.8 ms vs DuckDB 9.8 ms at sf0.1, the worst headline ratio — ~29 ms is
the measured no-op floor, so this script attributes the remaining ~26 ms
to its components under the EXACT bench session tuning).

Components measured (median of N, warm cache, memo cleared per run like
bench's fresh-exec protocol):
  floor        - spark.range(1).collect() through the same client path
  scan_only    - count(*) over the cached events frame (scan + schedule)
  agg_only     - the 2-key aggregate forced via a count() action
                 (adds the groupBy exchange over scan_only)
  agg_fetch    - aggregate + FULL result fetch, no top-20 (isolates the
                 driver transfer of ~all groups)
  full         - the registry query (adds TakeOrdered top-20, fetch of 20)

Usage: python scripts/measure_events_sessionish.py [sf_dir] [runs]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.numerics import (  # noqa: E402
    dsum,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.plan_cache import (  # noqa: E402
    clear_plan_memo,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.io import (  # noqa: E402
    cache_tables,
    read_table,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.aggregates import (  # noqa: E402
    events_sessionish,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 9

# identical to bench.py main(): partitions=4, AQE off, constraint prop off
spark = get_spark(
    app_name="measure_events",
    shuffle_partitions=4,
    extra_conf={
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.constraintPropagation.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
cache_tables(spark, SF, tables=("events",))


def _agg(ev):
    return ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(dsum("value"), 4).alias("sum_value"),
    )


def timed(label, build, action):
    action(build())  # warm code paths
    times = []
    for _ in range(RUNS):
        clear_plan_memo()
        df = build()
        t = time.time()
        action(df)
        times.append(time.time() - t)
    med = round(statistics.median(times) * 1000, 1)
    print(f"{label:12s} {med:7.1f} ms  "
          f"[{round(min(times)*1000,1)}, {round(max(times)*1000,1)}]")
    return med


ev = lambda: read_table(spark, SF, "events")  # noqa: E731
print(f"sf_dir={SF} runs={RUNS} events_rows={ev().count()}")
timed("floor", lambda: spark.range(1), lambda d: d.collect())
timed("scan_only", ev, lambda d: d.count())
timed("agg_only", lambda: _agg(ev()), lambda d: d.count())
timed("agg_fetch", lambda: _agg(ev()), lambda d: d.collect())
timed("full", lambda: events_sessionish(spark, SF), lambda d: d.collect())
