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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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


def _fetch_page(year: int) -> list[tuple[dt.date, int]]:
    """One 'API page' = one calendar year of observations. Deterministic
    offline stand-in for the HTTPS call (`etl.py:22-24`)."""
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
