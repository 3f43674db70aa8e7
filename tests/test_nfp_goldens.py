"""Golden-output tests for the 8 reference questions (SURVEY §5.2 item 5)
on an NFP-shaped monthly fixture (FIXTURES.md §2): a hand-checkable series
with a >2% drop that recovers, drops that never recover, and two decades.

The engine's query pack reads an orders-shaped table; the fixture writes
one order per month with o_totalprice = employment level, so the monthly
series equals the NFP series exactly.
"""

from __future__ import annotations

import datetime as dt

import pytest

from u_s__non_farm_payrolls_an_olap_analysis_spark.operators import olap

# (year, month, employment). Hand-designed:
# - 2019-05: -4.717% drop (prior peak 106), recovers 2019-07 (107 >= 106)
# - 2019-09, 2019-12, 2020-02: drops > 2% (prior peak 108), never recover
# - decades: 2010s and 2020s
SERIES = [
    (2019, 1, 100), (2019, 2, 102), (2019, 3, 104), (2019, 4, 106),
    (2019, 5, 101), (2019, 6, 103), (2019, 7, 107), (2019, 8, 108),
    (2019, 9, 105), (2019, 10, 104), (2019, 11, 106), (2019, 12, 103),
    (2020, 1, 101), (2020, 2, 98), (2020, 3, 99), (2020, 4, 100),
]


@pytest.fixture(scope="module")
def nfp_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nfp")
    rows = [
        (i, 1, "F", float(v), dt.datetime(y, m, 1), "1-URGENT")
        for i, (y, m, v) in enumerate(SERIES)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    return str(d)


def test_drops_detected(spark, nfp_dir):
    out = {
        r["month_start"].strftime("%Y-%m"): r["mom_pct_change"]
        for r in olap.filter_threshold(spark, nfp_dir).collect()
    }
    assert set(out) == {"2019-05", "2019-09", "2019-12", "2020-02"}
    assert abs(out["2019-05"] - (101 - 106) / 106 * 100) < 1e-4


def test_recovery_asof(spark, nfp_dir):
    rows = {
        r["drop_month"].strftime("%Y-%m"): r
        for r in olap.dice_recovery_asof(spark, nfp_dir).collect()
    }
    r1 = rows["2019-05"]
    assert r1["prior_peak"] == 106.0
    assert r1["recovery_month"].strftime("%Y-%m") == "2019-07"
    assert r1["months_to_recover"] == 2
    # the guard the reference needs at dashboard_nfp.py:166 — no recovery
    assert rows["2019-09"]["recovery_month"] is None
    assert rows["2019-09"]["months_to_recover"] is None
    assert rows["2020-02"]["recovery_month"] is None


def test_q4_sql_expander_semantics(spark, nfp_dir):
    # SURVEY §2.5 divergence: lag BEFORE the Q4 filter → October's change
    # (vs September) is included. October 2019: (104-105)/105.
    out = {
        r["month_name"]: r["avg_pct_change"]
        for r in olap.dice_q4_avg_by_month(spark, nfp_dir).collect()
    }
    assert set(out) == {"October", "November", "December"}
    assert abs(out["October"] - (104 - 105) / 105 * 100) < 1e-4


def test_decade_rollup_total_function(spark, nfp_dir):
    out = {
        r["decade"]: r["avg_totalprice"]
        for r in olap.rollup_decade_avg(spark, nfp_dir).collect()
    }
    # lambda semantics (dashboard_nfp.py:300): every year bucketed
    assert set(out) == {"2010s", "2020s"}
    assert abs(out["2020s"] - (101 + 98 + 99 + 100) / 4) < 1e-4


def test_top_year_and_sharpest_drop(spark, nfp_dir):
    top = olap.top1_by_metric(spark, nfp_dir).collect()[0]
    # only 2020 has a previous year: gain = 398 - 1249 → it's the (only) top1
    assert top["year"] == 2020
    drop = olap.drill_sharpest_drop(spark, nfp_dir).collect()[0]
    assert drop["month_start"].strftime("%Y-%m") == "2019-05"
    assert drop["month_name"] == "May"


def test_running_peak_and_scalars(spark, nfp_dir):
    peaks = {
        r["month_start"].strftime("%Y-%m"): r["prior_peak"]
        for r in olap.window_running_max(spark, nfp_dir).collect()
    }
    assert peaks["2019-01"] is None
    assert peaks["2019-09"] == 108.0
    assert olap.scalar_max(spark, nfp_dir).collect()[0]["max_total"] == 108.0
    assert olap.lookup_scalar(spark, nfp_dir).collect()[0][
        "peak_month"
    ].strftime("%Y-%m") == "2019-08"
