"""Custom Python DataSource (PySpark 4 DataSource API) for API-series
extraction — the production-shaped version of SURVEY §2 S1.

The reference fetches the FRED ``PAYEMS`` series with a driver-side HTTPS
client (``etl.py:22-25``). The DataSource API moves that boundary into the
engine: ``spark.read.format("fred_series")`` plans one partition per year
(API page), each executor task fetches and yields its page — so a thousand
series x fifty years fans out across the cluster instead of serializing
through the driver.

No network exists in this environment, so the fetch function is the same
deterministic offline series used by ``operators.sources`` — the *API
machinery* (DataSource/DataSourceReader/partitions/schema) is the real,
tested surface; swap ``_fetch_page`` for a real HTTP call in production.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DateType,
    LongType,
    StructField,
    StructType,
)

from ..operators.sources import fake_fred_payems


class YearPartition(InputPartition):
    def __init__(self, year: int):
        self.year = year


def _fetch_page_live(year: int) -> list[tuple[dt.date, int]]:
    """LIVE fetch of one calendar year of the public FRED ``PAYEMS``
    series over HTTPS (the reference's `etl.py:22-24` fetch, re-homed to
    executor tasks) — stdlib urllib, no client library. Requires network
    plus ``FRED_API_KEY`` (free registration at fred.stlouisfed.org);
    enabled only when ``SPARK_GRAFT_FRED_LIVE=1`` so the default engine
    stays deterministic and offline-reproducible."""
    import json
    import os
    import urllib.parse
    import urllib.request

    params = urllib.parse.urlencode(
        {
            "series_id": "PAYEMS",
            "api_key": os.environ["FRED_API_KEY"],
            "file_type": "json",
            "observation_start": f"{year}-01-01",
            "observation_end": f"{year}-12-31",
        }
    )
    url = f"https://api.stlouisfed.org/fred/series/observations?{params}"
    with urllib.request.urlopen(url, timeout=30) as resp:
        payload = json.load(resp)
    out = []
    for obs in payload.get("observations", []):
        if obs.get("value") in (None, "", "."):  # FRED's missing marker
            continue
        d = dt.date.fromisoformat(obs["date"])
        out.append((d, int(float(obs["value"]))))
    return out


def _fetch_page(year: int) -> list[tuple[dt.date, int]]:
    """One 'API page' = one calendar year of observations. Runs
    executor-side (called from ``FredSeriesReader.read``). Deterministic
    offline stand-in for the HTTPS call (`etl.py:22-24`) by default; set
    ``SPARK_GRAFT_FRED_LIVE=1`` + ``FRED_API_KEY`` for the real pull
    (env-gated integration test: tests/test_custom_source_stateful.py
    ``test_fred_live_fetch``)."""
    import os

    if os.environ.get("SPARK_GRAFT_FRED_LIVE") == "1":
        return _fetch_page_live(year)
    return [(d, v) for d, v in fake_fred_payems() if d.year == year]


class FredSeriesReader(DataSourceReader):
    def __init__(self, options: dict):
        try:
            self.start_year = int(options.get("start_year", 2019))
            self.end_year = int(options.get("end_year", 2024))
        except ValueError as e:
            raise ValueError(
                "fred_series: start_year/end_year must be integers "
                f"(got start_year={options.get('start_year')!r}, "
                f"end_year={options.get('end_year')!r})"
            ) from e
        if self.start_year > self.end_year:
            raise ValueError(
                f"fred_series: start_year ({self.start_year}) must be <= "
                f"end_year ({self.end_year})"
            )

    def partitions(self) -> list[InputPartition]:
        return [YearPartition(y) for y in range(self.start_year, self.end_year + 1)]

    def read(self, partition: YearPartition):
        for d, v in _fetch_page(partition.year):
            yield (d, v)


class FredSeriesDataSource(DataSource):
    """Register with ``spark.dataSource.register(FredSeriesDataSource)``
    then ``spark.read.format("fred_series").option("start_year", 2019)``."""

    @classmethod
    def name(cls) -> str:
        return "fred_series"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("date", DateType()),
                StructField("value", LongType()),
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return FredSeriesReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return FredSeriesStreamReader(self.options)


class FredSeriesStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the same source: the series arrives as a LIVE
    FEED, one API page (year) per micro-batch — the shape of a production
    poller that wakes, fetches whatever the API has past its offset, and
    commits. Offsets are plain ``{"year": y}`` dicts; Spark's checkpoint
    owns them, so a restarted query resumes mid-series without re-reading
    committed pages (``readBetweenOffsets`` replays a committed range for
    recovery). Validation mirrors the batch reader's."""

    def __init__(self, options: dict):
        # same validation rules as the batch FredSeriesReader
        FredSeriesReader(options)
        self.start_year = int(options.get("start_year", 2019))
        self.end_year = int(options.get("end_year", 2024))

    def initialOffset(self) -> dict:
        return {"year": self.start_year}

    def read(self, start: dict):
        y = int(start["year"])
        if y > self.end_year:  # caught up: no new pages, offset unchanged
            return iter([]), start
        return iter(_fetch_page(y)), {"year": y + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple[dt.date, int]] = []
        for y in range(int(start["year"]), int(end["year"])):
            rows.extend(_fetch_page(y))
        return iter(rows)
