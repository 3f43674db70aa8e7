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


def test_stateful_profile_accumulates_across_microbatches(spark, tmp_path):
    """The single-file events fixture streams as ONE micro-batch, so the
    state round-trip (state.get -> update -> next batch) is never hit by
    the registry query. Split the same rows into 3 files and force
    maxFilesPerTrigger=1: the final profiles must STILL equal the batch
    GROUP BY — proving the scaled-int + epoch-micros state accumulates
    correctly across batches, not just within one."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.streaming.state import GroupStateTimeout

    from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming.stateful import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        _update_profile,
    )
    from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming.stream_windows import (
        _drain_to_memory,
    )

    # 3 users x 6 events spread over 3 files (each user present in EVERY
    # file, so every key's state round-trips at least twice)
    rows = []
    for i in range(18):
        rows.append(
            {
                "user_id": i % 3,
                "ts_us": 1_706_000_000_000_000 + i * 1_000_003,
                "value": round(0.05 + i * 1.7305, 4),
            }
        )
    d = tmp_path / "ev3"
    d.mkdir()
    for f in range(3):
        part = rows[f::3]
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r["user_id"] for r in part], pa.int64()),
                    "ts_us": pa.array([r["ts_us"] for r in part], pa.int64()),
                    "value": pa.array([r["value"] for r in part], pa.float64()),
                }
            ),
            str(d / f"part{f}.parquet"),
        )

    ev = (
        spark.readStream.schema("user_id long, ts_us long, value double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(d))
    )
    profiles = ev.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    out = _drain_to_memory(profiles, spark, output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_us"])
        for r in out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    # batch ground truth with identical scaled-int arithmetic
    pdf = pd.DataFrame(rows)
    expect = {}
    for uid, g in pdf.groupby("user_id"):
        sv = int(
            sum(
                (1 if v >= 0 else -1) * int(abs(v * 10000) + 0.5)
                for v in g["value"]
            )
        )
        expect[uid] = (len(g), round(sv / 10000.0, 4), int(g["ts_us"].max()))
    assert got == expect


def test_stream_source_resumes_from_checkpoint(spark, tmp_path):
    """The Python streaming source must resume AFTER its last committed
    page on restart: a first query ingests 2019-2021, a second query over
    the extended 2019-2024 range reuses the SAME checkpoint and sink and
    must append only 2022-2024 — every year exactly once, no refetch of
    committed pages."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.sources.fred_datasource import (
        FredSeriesDataSource,
    )

    spark.dataSource.register(FredSeriesDataSource)
    sink = str(tmp_path / "series_sink")
    ckpt = str(tmp_path / "series_ckpt")

    def run(end_year: int) -> None:
        q = (
            spark.readStream.format("fred_series")
            .option("start_year", 2019)
            .option("end_year", end_year)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    run(2021)
    first = spark.read.parquet(sink).collect()
    assert sorted({r.date.year for r in first}) == [2019, 2020, 2021]
    assert len(first) == 36

    run(2024)
    rows = spark.read.parquet(sink).collect()
    per_year = {}
    for r in rows:
        per_year[r.date.year] = per_year.get(r.date.year, 0) + 1
    assert per_year == {y: 12 for y in range(2019, 2025)}, per_year


def test_json_dir_sink_manifest_protocol(spark, tmp_path):
    """The python-datasource sink's two-phase commit: readers trust only
    the manifest (planted stray + staged files stay invisible), append
    extends it, and a failed job publishes nothing."""
    import json
    import os

    from u_s__non_farm_payrolls_an_olap_analysis_spark.sources.table_sink import (
        MANIFEST,
        JsonDirSinkDataSource,
        committed_files,
    )

    spark.dataSource.register(JsonDirSinkDataSource)
    path = str(tmp_path / "sink")
    df = spark.range(10).select(F.col("id").cast("long").alias("k"))
    df.write.format("json_dir_sink").mode("overwrite").option(
        "path", path
    ).save()
    # plant files the manifest does not know about
    with open(os.path.join(path, "part-stray.jsonl"), "w") as f:
        f.write('{"k": 999}\n')
    with open(os.path.join(path, "_staged_part-orphan.jsonl"), "w") as f:
        f.write('{"k": 888}\n')
    files = committed_files(path)
    assert all("stray" not in p and "orphan" not in p for p in files)
    got = spark.read.schema("k long").json(files)
    assert sorted(r["k"] for r in got.collect()) == list(range(10))
    # append extends the manifest rather than replacing it
    spark.range(10, 15).select(F.col("id").alias("k")).write.format(
        "json_dir_sink"
    ).mode("append").option("path", path).save()
    got2 = spark.read.schema("k long").json(committed_files(path))
    assert sorted(r["k"] for r in got2.collect()) == list(range(15))
    # overwrite GC (round-9 ADVICE): a new generation physically removes
    # every part file the fresh manifest doesn't name — prior generations
    # AND the planted stray — and empty partitions are never promoted, so
    # the raw directory converges to exactly the manifest's parts
    spark.range(3).repartition(8).select(F.col("id").alias("k")).write.format(
        "json_dir_sink"
    ).mode("overwrite").option("path", path).save()
    named = {os.path.basename(p) for p in committed_files(path)}
    on_disk = {
        f for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".jsonl")
    }
    assert on_disk == named
    got3 = spark.read.schema("k long").json(committed_files(path))
    assert sorted(r["k"] for r in got3.collect()) == [0, 1, 2]
    # a failing job must not publish a manifest
    path2 = str(tmp_path / "sink_fail")
    bad = spark.range(4).select(
        F.when(F.col("id") < 3, F.col("id"))
        .otherwise(F.raise_error("boom"))
        .alias("k")
    )
    try:
        bad.write.format("json_dir_sink").mode("overwrite").option(
            "path", path2
        ).save()
        raised = False
    except Exception:
        raised = True
    assert raised
    assert not os.path.exists(os.path.join(path2, MANIFEST))
    if os.path.exists(path2):
        assert not [f for f in os.listdir(path2) if f.startswith("part-")]


def test_fred_live_fetch_env_gated():
    """Live-HTTP integration for the one remaining reference capability
    (the real FRED pull, `etl.py:22-24`): skipped unless the operator is
    explicitly enabled AND credentialed — the engine's default path must
    stay deterministic and offline. When enabled, the page fetcher must
    return monthly PAYEMS observations for the requested year."""
    import os

    import pytest

    if os.environ.get("SPARK_GRAFT_FRED_LIVE") != "1":
        pytest.skip("live FRED fetch disabled (set SPARK_GRAFT_FRED_LIVE=1)")
    if not os.environ.get("FRED_API_KEY"):
        pytest.skip("FRED_API_KEY not set")
    from u_s__non_farm_payrolls_an_olap_analysis_spark.sources.fred_datasource import (
        _fetch_page_live,
    )

    rows = _fetch_page_live(2023)
    assert len(rows) == 12  # monthly series, full year
    assert all(d.year == 2023 for d, _ in rows)
    assert all(v > 100_000 for _, v in rows)  # PAYEMS is ~150k (thousands)


def test_fred_offline_default_ignores_live_flag_absence():
    """Without the env gate the fetcher is the deterministic offline
    series — bit-identical to the oracle's VALUES inline."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.sources.fred_datasource import (
        _fetch_page,
    )

    rows = _fetch_page(2020)
    expect = [(d, v) for d, v in fake_fred_payems() if d.year == 2020]
    assert rows == expect
