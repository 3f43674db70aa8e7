"""Isolated-process measurement for the documents-corpus scale keys
(round 15, VERDICT r14 item 2).

BENCH_r14's in-protocol sfn sections read `dedup_levenshtein_blocked`
at 1.6x (30x docs) / 1.75x (100x docs) vs the round-13/14 quiet-host
readings of 1.52 / 1.05 — a drift with no code change to the operator.
The in-protocol sections time the docs keys LAST, after the Spark JVM
has accumulated the sf0.1+sf1+30x+100x cached working sets, so they are
the reading most exposed to host/heap state. This script settles the
number with the same two-subprocess protocol as
scripts/measure_100x_isolated.py (the only protocol CLAUDE.md 6b allows
for quotable scale claims): Spark generates/verifies/times then EXITS;
DuckDB re-verifies COUNT(*) and times with no JVM alive.

Usage: python scripts/measure_docs_isolated.py [--rep 30] [--runs 5]
Writes SCALE_docs{rep}x_isolated.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

KEYS = ("dedup_levenshtein_blocked", "dedup_ngram_jaccard",
        "quality_gopher_rules")

SPARK_CHILD = r"""
import json, os, statistics, sys, time
sys.path.insert(0, {repo!r})
import bench
from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark
from u_s__non_farm_payrolls_an_olap_analysis_spark import registry
from u_s__non_farm_payrolls_an_olap_analysis_spark.io import cache_tables
from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.plan_cache import (
    clear_plan_memo,
)

rep, runs, base_dir = {rep}, {runs}, {base_dir!r}
out_dir = os.path.join({repo!r}, f".bench_docs{{rep}}x")
# posture matches bench._sfn_section's swept settings (16 parts / AQE
# off below 100x; 32 / AQE on at 100x)
spark = get_spark(app_name="iso_docs",
                  shuffle_partitions=(32 if rep >= 100 else 16),
                  extra_conf={{"spark.sql.adaptive.enabled":
                               ("true" if rep >= 100 else "false"),
                               # match the bench session: constraint-
                               # propagation inference is NOT plan-time-
                               # only on explode-heavy plans (A/B: 13.0
                               # vs 9.6 s on ngram@30x — SCALE.md r15)
                               "spark.sql.constraintPropagation.enabled":
                               "false"}})
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
bench._ensure_docs_rep(spark, base_dir, out_dir, n_rep=rep)
gen_sec = time.time() - t0
table_rows = bench._table_rows(out_dir, ("documents",))
t0 = time.time()
cache_tables(spark, out_dir, tables=("documents",),
             max_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
cache_sec = time.time() - t0

qs = registry.queries()
timed, spread = {{}}, {{}}
for key in {keys!r}:
    fn = qs[key]
    fn(spark, out_dir).toPandas()  # warm: caches, codegen, code paths
    times = []
    for _ in range(runs):
        clear_plan_memo()
        df = fn(spark, out_dir)
        t = time.time()
        df.toPandas()
        times.append(time.time() - t)
    timed[key] = round(statistics.median(times), 4)
    spread[key] = [round(min(times), 4), round(max(times), 4)]
spark.stop()
print("SPARK_RESULT " + json.dumps({{
    "out_dir": out_dir, "rep": rep, "runs": runs,
    "gen_sec": round(gen_sec, 2), "cache_sec": round(cache_sec, 2),
    "table_rows": table_rows, "spark": timed, "spark_spread": spread,
}}), flush=True)
"""

DUCK_CHILD = r"""
import json, os, statistics, sys, time
sys.path.insert(0, {repo!r})
import duckdb
from u_s__non_farm_payrolls_an_olap_analysis_spark import registry

out_dir, runs = {out_dir!r}, {runs}
con = duckdb.connect()
con.execute("SET enable_progress_bar = false")
p = f"{{out_dir}}/documents.parquet"
src = f"'{{p}}/*.parquet'" if os.path.isdir(p) else f"'{{p}}'"
con.execute(f"CREATE VIEW documents AS SELECT * FROM {{src}}")
(n,) = con.execute("SELECT COUNT(*) FROM documents").fetchone()
table_rows = {{"documents": n}}
oracles = registry.oracle_sql()
timed, spread = {{}}, {{}}
for key in {keys!r}:
    sql = oracles[key]
    con.execute(sql).fetchdf()  # warm the OS page cache + duckdb state
    times = []
    for _ in range(runs):
        t = time.time()
        con.execute(sql).fetchdf()
        times.append(time.time() - t)
    timed[key] = round(statistics.median(times), 4)
    spread[key] = [round(min(times), 4), round(max(times), 4)]
con.close()
print("DUCK_RESULT " + json.dumps({{
    "table_rows": table_rows, "duckdb": timed, "duckdb_spread": spread,
}}), flush=True)
"""


def _run_child(code: str, tag: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith(tag):
            return json.loads(line[len(tag):])
    raise RuntimeError(
        f"child produced no {tag} line\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=30)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--base-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    print(f"phase A: Spark (gen+verify+time) docs rep={args.rep} ...",
          flush=True)
    spark_res = _run_child(
        SPARK_CHILD.format(repo=REPO, rep=args.rep, runs=args.runs,
                           base_dir=args.base_dir, keys=KEYS),
        "SPARK_RESULT ",
    )
    print(json.dumps(spark_res), flush=True)

    print("phase B: DuckDB (verify+time), no JVM alive ...", flush=True)
    duck_res = _run_child(
        DUCK_CHILD.format(repo=REPO, out_dir=spark_res["out_dir"],
                          runs=args.runs, keys=KEYS),
        "DUCK_RESULT ",
    )
    print(json.dumps(duck_res), flush=True)

    if spark_res["table_rows"] != duck_res["table_rows"]:
        raise SystemExit(
            f"row-count mismatch between phases: {spark_res['table_rows']} "
            f"vs {duck_res['table_rows']}"
        )

    merged = {
        "protocol": (
            "two sequential subprocesses: Spark generates+verifies+times "
            "then exits; DuckDB re-verifies COUNT(*) and times with no "
            "JVM alive (CLAUDE.md 6b). Fresh-plan, warm inputs, median "
            f"of {args.runs}, spreads recorded."
        ),
        "rep": args.rep,
        "runs": args.runs,
        "base_dir": args.base_dir,
        "table_rows": spark_res["table_rows"],
        "gen_sec": spark_res["gen_sec"],
        "cache_sec": spark_res["cache_sec"],
        "spark": spark_res["spark"],
        "spark_spread": spark_res["spark_spread"],
        "duckdb": duck_res["duckdb"],
        "duckdb_spread": duck_res["duckdb_spread"],
        "ratio_per_query": {
            k: round(spark_res["spark"][k] / duck_res["duckdb"][k], 3)
            for k in KEYS
        },
    }
    out_path = os.path.join(REPO, f"SCALE_docs{args.rep}x_isolated.json")
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(merged["ratio_per_query"]), flush=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
