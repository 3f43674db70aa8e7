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
