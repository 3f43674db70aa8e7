"""Window-layer unit tests (SURVEY §5.2 item 3): pin the lag/null
semantics the reference mishandles (`etl.py:37-38` first-row NaN)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.timeparts import (
    decade_label,
    diff,
    month_name,
    months_between_int,
    pct_change,
    running_max_prior,
    year_of,
)


def _series(spark, vals):
    rows = [
        (dt.datetime(2020, m + 1, 1), float(v)) for m, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "d timestamp, v double")


def test_pct_change_first_row_null(spark):
    df = _series(spark, [100, 110, 99])
    w = Window.orderBy("d")
    out = df.select("d", pct_change(F.col("v"), w).alias("p")).orderBy("d").collect()
    assert out[0]["p"] is None  # lag null → reference drops it (etl.py:38)
    assert abs(out[1]["p"] - 10.0) < 1e-9
    assert abs(out[2]["p"] - (-10.0)) < 1e-9


def test_diff_and_running_max_frame(spark):
    df = _series(spark, [5, 3, 8, 6])
    w = Window.orderBy("d")
    out = (
        df.select(
            "d",
            diff(F.col("v"), w).alias("dv"),
            running_max_prior(F.col("v"), w).alias("peak"),
        )
        .orderBy("d")
        .collect()
    )
    assert [r["dv"] for r in out] == [None, -2.0, 5.0, -2.0]
    # strictly-preceding frame: first row has NO prior peak
    assert [r["peak"] for r in out] == [None, 5.0, 5.0, 8.0]


def test_partitioned_pct_change_resets_per_year(spark):
    rows = [
        (dt.datetime(2019, 12, 1), 100.0),
        (dt.datetime(2020, 1, 1), 200.0),
        (dt.datetime(2020, 2, 1), 220.0),
    ]
    df = spark.createDataFrame(rows, "d timestamp, v double")
    w = Window.partitionBy(year_of("d")).orderBy("d")
    out = df.select("d", pct_change(F.col("v"), w).alias("p")).orderBy("d").collect()
    # January restarts its year partition → null, NOT +100% vs December
    assert out[0]["p"] is None and out[1]["p"] is None
    assert abs(out[2]["p"] - 10.0) < 1e-9


def test_timepart_expressions(spark):
    df = spark.createDataFrame(
        [(dt.datetime(1997, 10, 15),), (dt.datetime(2003, 1, 1),)], "d timestamp"
    )
    out = df.select(
        year_of("d").alias("y"),
        month_name("d").alias("mn"),
        decade_label(year_of("d")).alias("dec"),
    ).collect()
    assert (out[0]["y"], out[0]["mn"], out[0]["dec"]) == (1997, "October", "1990s")
    assert (out[1]["y"], out[1]["mn"], out[1]["dec"]) == (2003, "January", "2000s")


def test_months_between_int_exact(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2020, 3, 1), dt.datetime(2021, 1, 1))], "a timestamp, b timestamp"
    )
    out = df.select(months_between_int(F.col("b"), F.col("a")).alias("m")).collect()
    assert out[0]["m"] == 10


def test_funnel_requires_stage_order(spark, tmp_path):
    """agg_funnel_conversion must only credit stages reached IN ORDER:
    a click before any view is not a conversion, a purchase before the
    first ordered click is not a purchase-conversion."""
    import datetime as dt

    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_funnel_conversion,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: full ordered chain
        (1, t0, 1, "view", 1.0, None),
        (2, t0 + dt.timedelta(hours=1), 1, "click", 1.0, None),
        (3, t0 + dt.timedelta(hours=2), 1, "purchase", 1.0, None),
        # u2: click BEFORE its only view -> no click conversion
        (4, t0, 2, "click", 1.0, None),
        (5, t0 + dt.timedelta(hours=1), 2, "view", 1.0, None),
        # u3: purchase before the ordered click -> view+click only
        (6, t0, 3, "view", 1.0, None),
        (7, t0 + dt.timedelta(hours=1), 3, "purchase", 1.0, None),
        (8, t0 + dt.timedelta(hours=2), 3, "click", 1.0, None),
        # u4: never viewed
        (9, t0, 4, "purchase", 1.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = agg_funnel_conversion(spark, str(tmp_path)).collect()[0]
    assert r["n_users"] == 4
    assert r["n_view"] == 3      # u1, u2, u3
    assert r["n_click"] == 2     # u1, u3 (u2's click precedes its view)
    assert r["n_purchase"] == 1  # u1 only
