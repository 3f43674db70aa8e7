"""Semi-structured (JSON) column operators (SURVEY §2.10 X9).

The reference has no nested types (SURVEY §1.2); the driver's
``events.props`` JSON string column hosts this surface. Two extraction
paths, both JVM-side (no Python in the hot loop):

- ``get_json_object`` — per-field path extraction (JsonPath), good when a
  query touches one or two fields;
- ``from_json`` with an explicit schema — parse once into a struct, good
  when many fields are consumed (single parse, then struct field access is
  free column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from ..io import read_table


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — extract ``props.k`` and aggregate it per event type."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def json_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9b — schema-full parse via ``from_json``: one parse per row into a
    typed struct; malformed rows become NULL struct (counted)."""
    ev = read_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", IntegerType())])
    parsed = ev.select(
        "event_id", F.from_json("props", schema).alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.col("p").isNull().cast("int").alias("malformed"),
    )


QUERIES = {
    "json_extract_props": json_extract_props,
    "json_from_json_struct": json_from_json_struct,
}

ORACLE = {
    "json_extract_props": (
        "SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k, "
        "MIN(k) AS min_k, MAX(k) AS max_k FROM ("
        "SELECT event_type, "
        "CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) "
        "GROUP BY 1"
    ),
    "json_from_json_struct": (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k, "
        "CASE WHEN json_valid(props) THEN 0 ELSE 1 END AS malformed "
        "FROM events"
    ),
}
