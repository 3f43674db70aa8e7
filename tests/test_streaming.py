"""Streaming tests: batch-equivalence is covered by the oracle harness;
here we cover the foreachBatch keyed-upsert sink — the streaming mirror of
the reference's idempotent ON CONFLICT loop (`etl.py:57-73`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import upsert_by_key
from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming.stream_windows import (
    _events_stream,
)

SF = "/root/testdata/sf0.001"


def test_foreachbatch_upsert_sink(spark, tmp_path):
    """Aggregate a stream per user and merge each micro-batch into a
    parquet target by key: reprocessing is idempotent, exactly like the
    reference's keyed upsert."""
    target_path = str(tmp_path / "user_totals")

    def merge_batch(batch_df, batch_id):
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
        )
        try:
            target = batch_df.sparkSession.read.parquet(target_path)
        except Exception:
            target = agg.limit(0)
        merged = upsert_by_key(target, agg, ["user_id"])
        merged.write.mode("overwrite").parquet(target_path + "_tmp")
        batch_df.sparkSession.read.parquet(target_path + "_tmp").write.mode(
            "overwrite"
        ).parquet(target_path)

    stream = _events_stream(spark, SF)
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    result_rows = sorted(
        (r["user_id"], r["n"]) for r in spark.read.parquet(target_path).collect()
    )
    batch = spark.read.parquet(f"{SF}/events.parquet")
    assert len(result_rows) == batch.select("user_id").distinct().count()
    # rerun the same data through a fresh stream -> same target (idempotent)
    q2 = (
        _events_stream(spark, SF)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q2.awaitTermination()
    again_rows = sorted(
        (r["user_id"], r["n"]) for r in spark.read.parquet(target_path).collect()
    )
    assert again_rows == result_rows


def test_stream_source_schema(spark):
    df = _events_stream(spark, SF)
    assert df.isStreaming
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_drain_leaves_no_memory_sink_views(spark):
    """_drain_to_memory must drop its memory-sink temp view — repeated
    streaming invocations in one session must not accumulate catalog
    entries (round-1 advice)."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming.stream_windows import (
        stream_tumbling_agg,
    )

    def sink_views():
        return [
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("stream_out_")
        ]

    before = sink_views()
    out = stream_tumbling_agg(spark, SF)
    assert out.count() > 0
    assert sink_views() == before


def test_events_stream_decodes_both_ts_units(spark, tmp_path):
    """The driver's events.parquet has shipped ts as timestamp[ns] AND
    timestamp[us] across data generations; a wrong unit assumption
    corrupts every event time by 10^3 (the round-6/7 1970-dated-window
    bug). Pin: the stream decodes BOTH encodings to identical wall
    times."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming import (
        stream_windows as sw,
    )

    base_us = [1706640381466163, 1706623415462107]  # 2024-01-30, micros
    rows = {
        "event_id": [1, 2],
        "user_id": [10, 20],
        "event_type": ["click", "view"],
        "value": [1.5, 2.5],
        "props": ["{}", "{}"],
    }
    dirs = {}
    for unit in ("us", "ns"):
        d = tmp_path / unit
        d.mkdir()
        mult = 1 if unit == "us" else 1000
        tbl = pa.table(
            {**rows, "ts": pa.array([v * mult for v in base_us],
                                    type=pa.timestamp(unit))}
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        dirs[unit] = str(d)

    got = {}
    for unit, d in dirs.items():
        assert sw._events_ts_unit(f"{d}/events.parquet") == unit
        ev = sw._events_stream(spark, d).select("event_id", "ts", "value")
        q = (
            ev.writeStream.format("memory")
            .queryName(f"unit_{unit}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got[unit] = {
            r["event_id"]: r["ts"]
            for r in spark.table(f"unit_{unit}").collect()
        }
    assert got["us"] == got["ns"]
    # and the values are the true 2024 wall times, not 1970 corruptions
    assert got["us"][1].year == 2024
