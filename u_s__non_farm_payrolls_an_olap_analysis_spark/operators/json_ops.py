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


def json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9c — MapType surface: parse props as MAP<STRING,INT>, explode to
    (key, value) rows, aggregate per key. At scale this is the schema-free
    path for heterogeneous property bags (vs the fixed-schema struct)."""
    ev = read_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    kv = ev.select(F.explode(m).alias("key", "value"))
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


QUERIES = {
    "json_extract_props": json_extract_props,
    "json_from_json_struct": json_from_json_struct,
    "json_map_explode": json_map_explode,
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
    "json_map_explode": (
        # keys/values via DuckDB's JSON→MAP cast, exploded with UNNEST
        "WITH kv AS (SELECT u.key, CAST(u.value AS INT) AS value FROM ("
        "SELECT CAST(props AS JSON) AS j FROM events) e, "
        "UNNEST(json_keys(e.j)) AS t(key), "
        "LATERAL (SELECT t.key AS key, "
        "json_extract_string(e.j, '$.' || t.key) AS value) u) "
        "SELECT key, COUNT(*) AS n, CAST(SUM(value) AS BIGINT) AS sum_value, "
        "MIN(value) AS min_value, MAX(value) AS max_value FROM kv GROUP BY 1"
    ),
}
