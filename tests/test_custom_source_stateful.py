"""Custom Python DataSource + stateful streaming operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table
from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.sources import (
    fake_fred_payems,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.sources.fred_datasource import (
    FredSeriesDataSource,
)
from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming.stateful import (
    stream_stateful_user_profile,
)

SF = "/root/testdata/sf0.001"


def test_fred_datasource_reads_partitioned_series(spark):
    spark.dataSource.register(FredSeriesDataSource)
    df = (
        spark.read.format("fred_series")
        .option("start_year", 2019)
        .option("end_year", 2024)
        .load()
    )
    rows = sorted((r["date"], r["value"]) for r in df.collect())
    expect = sorted(fake_fred_payems())
    assert rows == expect
    # one partition per year -> parallel API pages
    assert df.rdd.getNumPartitions() == 6


def test_stateful_profile_matches_batch(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.numerics import (
        dsum,
    )

    prof = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_ts"])
        for r in stream_stateful_user_profile(spark, SF).collect()
    }
    ev = read_table(spark, SF, "events")
    # same scaled-int sum the state accumulator uses — exact equality, not
    # FP-tolerance: the whole point of the int64 state
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 4), r["last"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("s"),
            F.max("ts").alias("last"),
        )
        .collect()
    }
    assert prof == batch


def test_tws_user_totals_if_available(spark):
    """transformWithStateInPandas (Spark 4 successor stateful API) — runs
    only where its protobuf driver-worker dependency exists; asserts exact
    batch equivalence via the scaled-int state accumulation."""
    import duckdb
    import pytest

    from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming.stateful import (
        TWS_ORACLE_SQL,
        stream_tws_user_totals,
        tws_available,
    )

    if not tws_available():
        pytest.skip("python protobuf not installed (TWS driver worker needs it)")

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in stream_tws_user_totals(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = {
        u: (n, sv) for u, n, sv in con.execute(TWS_ORACLE_SQL).fetchall()
    }
    assert got == want


def test_tws_probe_matches_env():
    """The TWS capability gate must agree with the actual environment
    (pinned evidence: TWS_PROBE.md) — a stale probe would either silently
    drop a runnable operator or crash the registry on import."""
    import importlib.util

    from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming.stateful import (
        tws_available,
    )

    try:
        # find_spec raises if the parent "google" namespace is absent
        present = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        present = False
    assert tws_available() == present
