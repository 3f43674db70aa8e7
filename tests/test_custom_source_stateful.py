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
    prof = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in stream_stateful_user_profile(spark, SF).collect()
    }
    ev = read_table(spark, SF, "events")
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert prof == batch
