"""Broad 30x scale sweep over registry keys the bench section never
times (round 14): run a representative heavy subset at .bench_sf3x
(facts replicated 30x), time Spark fresh-plan medians in-process, then
the DuckDB oracles in a fresh subprocess (CLAUDE.md 6b), and print
ratios worst-first. The point is DISCOVERY — finding operators whose
plan is fine at sf0.1 but degrades at 30x — not record-keeping; treat
any ratio > ~3 as a candidate for plan work, then verify with the
isolated protocol before quoting.

Usage: python scripts/measure_scale_sweep.py [keys...] (default: the
representative set below). Runs=3.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

DEFAULT_KEYS = [
    # stats battery over the 30x fact tables
    "agg_gini_customer_revenue",
    "agg_kruskal_wallis",
    "agg_mann_whitney_u",
    "agg_decision_stump_gini",
    "agg_skew_kurtosis",
    "agg_lorenz_curve_deciles",
    "agg_trimmed_mean",
    "agg_winsorized_mean",
    "agg_herfindahl_brand_hhi",
    "agg_theil_atkinson_inequality",
    # windows / olap
    "window_rolling_ols_slope",
    "window_peer_zscore",
    "window_ytd_vs_prior_year",
    "rfm_segmentation",
    "abc_pareto_parts",
    "rollup_cohort_ltv",
    "retention_cohorts",
    "scd2_customer_priority_history",
    # events family at 30x events
    "events_user_path_trigrams",
    "events_conversion_latency_quantiles",
    "events_survival_km",
    "events_new_vs_returning",
    "events_dau_mau_stickiness",
    "events_attribution_last_touch",
    "events_sessions_per_user_hist",
    "events_bounce_rate_daily",
    # graph (co-purchase off 30x lineitem)
    "graph_pagerank_personalized",
    "graph_kcore_peel",
    "graph_degree_assortativity",
    # tpch heavies not in the bench section
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
    "tpch_q21_suppliers_kept_waiting",
]

RUNS = 3
# SCALE_SWEEP_DIR overrides the fixture dir (round 15): the docs-corpus
# keys (vocab_bpe_learn_merges, ...) must sweep against .bench_docs30x —
# .bench_sf3x's documents.parquet is a 1x byte copy of the dims.
D = os.environ.get("SCALE_SWEEP_DIR", os.path.join(REPO, ".bench_sf3x"))


def main() -> None:
    keys = sys.argv[1:] or DEFAULT_KEYS
    from u_s__non_farm_payrolls_an_olap_analysis_spark import registry
    from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.plan_cache import (
        clear_plan_memo,
    )
    from u_s__non_farm_payrolls_an_olap_analysis_spark.io import cache_tables
    from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark

    spark = get_spark(
        app_name="scale_sweep",
        shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false",
                    "spark.sql.constraintPropagation.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    present = tuple(
        t
        for t in ("orders", "lineitem", "events", "customer", "nation",
                  "supplier", "part", "documents", "embeddings")
        if os.path.exists(os.path.join(D, f"{t}.parquet"))
    )
    cache_tables(
        spark, D,
        tables=present,
        max_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    qs = registry.queries()
    oracles = registry.oracle_sql()
    spark_sec: dict[str, float] = {}
    for key in keys:
        fn = qs.get(key)
        if fn is None:
            print(f"UNKNOWN KEY {key}", flush=True)
            continue
        try:
            fn(spark, D).toPandas()  # warm
            times = []
            for _ in range(RUNS):
                clear_plan_memo()
                # clock STARTS before construction: iterative driver-loop
                # operators (CC, BPE, PCA) execute their localCheckpoint
                # rounds EAGERLY inside fn() — timing only the final
                # action would measure a checkpoint fetch, not the work
                # (round-15 finding: CC@30x read 0.21 s that way)
                t = time.time()
                fn(spark, D).toPandas()
                times.append(time.time() - t)
            spark_sec[key] = round(statistics.median(times), 3)
        except Exception as e:  # noqa: BLE001 - report and continue
            spark_sec[key] = None
            print(f"SPARK ERROR {key}: {str(e)[:200]}", flush=True)
        print(f"spark {key}: {spark_sec[key]}", flush=True)
    spark.stop()

    duck_child = f"""
import json, statistics, sys, time, os
sys.path.insert(0, {REPO!r})
import duckdb
from u_s__non_farm_payrolls_an_olap_analysis_spark import registry
con = duckdb.connect()
con.execute("SET enable_progress_bar = false")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{D}/{{t}}.parquet"
    if os.path.exists(p):
        src = f"'{{p}}/*.parquet'" if os.path.isdir(p) else f"'{{p}}'"
        con.execute(f"CREATE VIEW {{t}} AS SELECT * FROM {{src}}")
oracles = registry.oracle_sql()
out = {{}}
for key in {keys!r}:
    if key not in oracles:
        out[key] = None
        continue
    sql = oracles[key]
    import threading
    # hard per-key budget: interrupt DuckDB rather than letting one
    # pathological oracle (the CC recursive CTE ground >22 min at
    # 30x) stall the whole sweep; an interrupted key reports as
    # DUCK ERROR (interrupt) and the summary shows n/a
    tm = threading.Timer(
        float(os.environ.get("DUCK_BUDGET", "900")), con.interrupt
    )
    tm.start()
    try:
        t = time.time(); con.execute(sql).fetchdf()
        warm = time.time() - t
        tm.cancel()
        if warm > 120.0:
            # past any useful baseline precision (the Spark side is
            # sub-second here): record the single warm run and move on
            # rather than stalling the whole sweep (round-15: the CC
            # recursive-CTE oracle ground >22 min at 30x)
            out[key] = round(warm, 3)
            print("DUCK SLOW (1 run)", key, round(warm, 1), flush=True)
            continue
        times = []
        for _ in range({RUNS}):
            t = time.time(); con.execute(sql).fetchdf()
            times.append(time.time() - t)
        out[key] = round(statistics.median(times), 3)
    except Exception as e:
        out[key] = None
        print("DUCK ERROR", key, str(e)[:200], flush=True)
    finally:
        tm.cancel()  # or an expired timer would interrupt a LATER key
print("DUCK_RESULT " + json.dumps(out), flush=True)
"""
    proc = subprocess.run(
        [sys.executable, "-c", duck_child],
        capture_output=True, text=True, cwd=REPO, timeout=7200,
    )
    duck_sec = {}
    for line in proc.stdout.splitlines():
        if line.startswith("DUCK_RESULT "):
            duck_sec = json.loads(line[len("DUCK_RESULT "):])
        elif line.strip():
            print(line, flush=True)
    if not duck_sec:
        print("duck child stderr:", proc.stderr[-2000:])
        raise SystemExit(1)

    rows = []
    for key in keys:
        s, d = spark_sec.get(key), duck_sec.get(key)
        ratio = round(s / d, 2) if s and d else None
        rows.append((ratio if ratio is not None else -1, key, s, d))
    rows.sort(reverse=True)
    print(f"\n{'ratio':>7}  {'spark':>7}  {'duck':>7}  key")
    for ratio, key, s, d in rows:
        print(f"{ratio if ratio != -1 else 'n/a':>7}  {s!s:>7}  {d!s:>7}  {key}")


if __name__ == "__main__":
    main()
