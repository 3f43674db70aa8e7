"""Session-timezone independence of the events decode paths (round-8).

The driver's correctness harness may run on a PLAIN session that does not
pin ``spark.sql.session.timeZone=UTC`` (``PARITY_PLAIN_SESSION``), and a
host is not guaranteed to be UTC. DuckDB reads the fixture's timestamps as
naive walls with no timezone at all, so every Spark decode path must
produce the same values under ANY session timezone:

- ``functions.timeparts.ntz_from_epoch_micros`` / ``epoch_micros_from_ntz``
  are pure arithmetic (no instant↔wall cast) and exact inverses;
- ``io.read_table("events")`` yields identical walls under UTC and a
  non-UTC zone (both fixture encodings);
- ``streaming._events_stream`` yields instants whose epoch equals the
  wall-read-as-UTC, independent of the session zone (round-7 ADVICE: the
  micros path used an NTZ→TIMESTAMP cast, which is zone-dependent).
"""

from __future__ import annotations

import contextlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from u_s__non_farm_payrolls_an_olap_analysis_spark.functions.timeparts import (
    epoch_micros_from_ntz,
    ntz_from_epoch_micros,
    ntz_from_instant,
)

NONUTC = "America/New_York"  # DST zone: catches offset AND transition bugs


@contextlib.contextmanager
def _session_tz(spark, tz: str):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


EPOCHS = [
    1706640381466163,  # 2024-01-30 (EST)
    1721999999999999,  # 2024-07-26 (EDT — other side of a DST transition)
    0,
    1,
    999_999,
    -1,
    -500_000,
    -86_400_000_000,
]


def test_ntz_epoch_roundtrip_exact_under_non_utc(spark):
    df = spark.createDataFrame([(v,) for v in EPOCHS], "us long")
    with _session_tz(spark, NONUTC):
        rows = df.select(
            "us",
            epoch_micros_from_ntz(ntz_from_epoch_micros("us")).alias("back"),
            ntz_from_epoch_micros("us").alias("ntz"),
        ).collect()
    for r in rows:
        assert r.back == r.us
    # wall == UTC rendering of the epoch, not the session zone's
    import datetime as dt

    jan = next(r for r in rows if r.us == 1706640381466163)
    assert jan.ntz == dt.datetime(2024, 1, 30, 18, 46, 21, 466163)


def test_ntz_from_instant_matches_utc_wall(spark):
    df = spark.createDataFrame(
        [(v,) for v in EPOCHS], "us long"
    ).select(F.timestamp_micros("us").alias("ts"), "us")
    with _session_tz(spark, NONUTC):
        rows = df.select(
            "us", epoch_micros_from_ntz(ntz_from_instant("ts")).alias("back")
        ).collect()
    assert all(r.back == r.us for r in rows)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_read_table_events_decode_is_tz_independent(spark, tmp_path, unit):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.io import (
        clear_table_cache,
        read_table,
    )

    base = [1706640381466163, 1721999999999999]
    mult = 1 if unit == "us" else 1000
    tbl = pa.table(
        {
            "event_id": [1, 2],
            "ts": pa.array([v * mult for v in base], type=pa.timestamp(unit)),
            "user_id": [1, 2],
            "event_type": ["click", "view"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    )
    d = tmp_path / unit
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    def walls():
        clear_table_cache()
        df = read_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        return {r["event_id"]: r["ts"] for r in df.select("event_id", "ts").collect()}

    got_utc = walls()
    with _session_tz(spark, NONUTC):
        got_ny = walls()
    clear_table_cache()
    assert got_utc == got_ny
    assert got_utc[1].year == 2024


def test_events_stream_instants_are_tz_independent(spark, tmp_path):
    """Both stream decode paths must yield epoch == wall-read-as-UTC under
    a non-UTC session (the micros path previously cast NTZ→TIMESTAMP,
    shifting by the zone offset)."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming import (
        stream_windows as sw,
    )

    base = [1706640381466163, 1721999999999999]
    got = {}
    for unit in ("us", "ns"):
        mult = 1 if unit == "us" else 1000
        d = tmp_path / unit
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "event_id": [1, 2],
                    "ts": pa.array(
                        [v * mult for v in base], type=pa.timestamp(unit)
                    ),
                    "user_id": [1, 2],
                    "event_type": ["click", "view"],
                    "value": [1.0, 2.0],
                    "props": ["{}", "{}"],
                }
            ),
            str(d / "events.parquet"),
        )
        with _session_tz(spark, NONUTC):
            ev = sw._events_stream(spark, str(d)).select(
                "event_id", F.unix_micros("ts").alias("us")
            )
            q = (
                ev.writeStream.format("memory")
                .queryName(f"tzi_{unit}")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            got[unit] = {
                r["event_id"]: r["us"]
                for r in spark.table(f"tzi_{unit}").collect()
            }
            spark.catalog.dropTempView(f"tzi_{unit}")
    assert got["us"] == got["ns"] == {1: base[0], 2: base[1]}


def test_events_horizon_staging_is_unit_and_tz_independent(spark, tmp_path):
    """The left-outer join's horizon staging must normalize ns and us
    fixtures to the SAME microsecond values (pure int64 arithmetic — no
    session involvement at all), and its sentinels must sit strictly
    past the real horizon in both cases."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming import (
        stream_windows as sw,
    )

    base = [1706640381466163, 1721999999999999]
    staged = {}
    for unit in ("us", "ns"):
        mult = 1 if unit == "us" else 1000
        d = tmp_path / unit
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "event_id": [1, 2],
                    "ts": pa.array(
                        [v * mult for v in base], type=pa.timestamp(unit)
                    ),
                    "user_id": [1, 2],
                    "event_type": ["purchase", "click"],
                    "value": [1.0, 2.0],
                    "props": ["{}", "{}"],
                }
            ),
            str(d / "events.parquet"),
        )
        h = sw._events_horizon_dir(str(d))
        real = pq.read_table(f"{h}/part-00000.parquet")
        assert real.column("ts").type == pa.timestamp("us")
        staged[unit] = sorted(
            real.column("ts").cast(pa.int64()).to_pylist()
        )
        s1 = pq.read_table(f"{h}/part-00001.parquet")
        assert min(s1.column("ts").cast(pa.int64()).to_pylist()) > max(base)
    assert staged["us"] == staged["ns"] == sorted(base)
