"""Dump .explain("formatted") for the given registry keys into
plans/r15/<key>_<suffix>.txt — the judge-checkable plan evidence for
the round-15 optimization record (OPTIMIZATION_r15.md).

Usage:
    python scripts/dump_plans_r15.py <suffix> <out_dir> [keys...]

Run from the tree whose plans you want (a worktree checked out at the
pre-change commit for "before", the live tree for "after"). Mostly
plan-only, BUT NOT side-effect-free: operators that call
``localCheckpoint(eager=True)`` at DataFrame-construction time (and
iterative operators, which run their whole driver loop) execute
corpus-scale Spark jobs during the dump — so plan dumps must NOT run
concurrently with any timing session (CLAUDE.md rule 6b: concurrent
sessions inflate spreads 3-5x).
"""
from __future__ import annotations

import os
import sys
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

D = os.environ.get("PLAN_DUMP_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix, out_dir = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    from u_s__non_farm_payrolls_an_olap_analysis_spark import registry
    from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark

    spark = get_spark(app_name=f"plan_dump_{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for key in keys:
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        try:
            df = qs[key](spark, D)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception:  # noqa: BLE001 — record the failure in the file
            text = "PLAN DUMP FAILED:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
