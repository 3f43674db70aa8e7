"""Full-registry timing sweep (round 15, optimization): time EVERY
registry key at $REGISTRY_SWEEP_DIR (default /root/testdata/sf0.1),
Spark only, and write a ranked JSON. This is the measure-first triage
instrument (guide §1): absolute seconds against the ~0.03-0.09 s
plan+floor cost rank the operators; anything that stands out gets a
plan read and, if warranted, plan work + a before/after record in
OPTIMIZATION_r15.md.

Protocol: warm once (untimed), then RUNS timed build+execute passes
with the plan memo cleared — the clock starts BEFORE construction
(CLAUDE.md 6b round-15 rule: iterative/eager-checkpoint operators do
their work inside fn()). Median + min recorded.

Usage: python scripts/measure_registry_sweep.py [out.json] [keys...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

RUNS = 2
D = os.environ.get("REGISTRY_SWEEP_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "plans", "r15", "registry_sweep_sf01.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    from u_s__non_farm_payrolls_an_olap_analysis_spark import registry
    from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.plan_cache import (
        clear_plan_memo,
    )
    from u_s__non_farm_payrolls_an_olap_analysis_spark.io import cache_tables
    from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark

    spark = get_spark(
        app_name="registry_sweep",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    present = tuple(
        t
        for t in ("orders", "lineitem", "events", "customer", "nation",
                  "supplier", "part", "documents", "embeddings")
        if os.path.exists(os.path.join(D, f"{t}.parquet"))
    )
    cache_tables(
        spark, D, tables=present,
        max_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    # measured per-sweep floor for reading the results against
    spark.range(1).toPandas()
    floor_times = []
    for _ in range(5):
        t = time.time()
        spark.range(1).toPandas()
        floor_times.append(time.time() - t)
    floor = round(statistics.median(floor_times), 4)

    qs = registry.queries()
    keys = sys.argv[2:] or list(qs)
    results: dict[str, dict] = {}
    t_sweep0 = time.time()
    for i, key in enumerate(keys):
        fn = qs[key]
        spark.sparkContext.setJobDescription(f"sweep:{key}")
        try:
            t0 = time.time()
            n_rows = len(fn(spark, D).toPandas())  # warm (timed as warm_sec)
            warm = time.time() - t0
            times = []
            for _ in range(RUNS):
                clear_plan_memo()
                t = time.time()
                fn(spark, D).toPandas()
                times.append(time.time() - t)
            results[key] = {
                "median_sec": round(statistics.median(times), 3),
                "min_sec": round(min(times), 3),
                "warm_sec": round(warm, 3),
                "rows": n_rows,
            }
        except Exception as e:  # noqa: BLE001 — record and continue
            results[key] = {"error": str(e)[:300]}
            print(f"ERROR {key}: {str(e)[:200]}", flush=True)
        finally:
            clear_plan_memo()
        r = results[key]
        print(
            f"[{i + 1}/{len(keys)}] {key}: "
            f"{r.get('median_sec', 'ERR')}", flush=True,
        )
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    payload = {
        "dir": D,
        "runs": RUNS,
        "noop_floor_sec": floor,
        "sweep_wall_sec": round(time.time() - t_sweep0, 1),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    # explicit None check: a legitimate 0.0 median (sub-ms key after
    # round(...,3)) must not rank as slowest (r15 ADVICE)
    ranked = sorted(
        (
            (v["median_sec"] if v.get("median_sec") is not None else 999.0, k)
            for k, v in results.items()
        ),
        reverse=True,
    )
    print(f"\nfloor={floor}s; slowest 40 of {len(results)}:")
    for sec, key in ranked[:40]:
        print(f"{sec:>8}  {key}")
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
