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

from ..io import read_table


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — extract ``props.k`` and aggregate it per event type.
    ``try_cast`` so a non-integer value yields NULL instead of an ANSI
    cast error mid-aggregate."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
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
    """X9b — schema-full parse with malformed detection.

    ``from_json`` to a STRUCT never yields a NULL struct (PERMISSIVE mode
    null-fills the fields), so struct-is-null cannot detect malformed rows;
    parsing to a MAP does return NULL for anything that is not a JSON
    object — that is the validity signal. Field values extract via
    ``get_json_object`` + ``try_cast`` (null on bad types, no ANSI throw).
    """
    ev = read_table(spark, sf_dir, "events")
    is_object = F.from_json("props", "map<string,string>").isNotNull()
    return ev.select(
        "event_id",
        F.when(
            is_object, F.get_json_object("props", "$.k").try_cast("int")
        ).alias("k"),
        (~is_object).cast("int").alias("malformed"),
    )


def json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9c — MapType surface: parse props as MAP<STRING,INT>, explode to
    (key, value) rows, aggregate per key. At scale this is the schema-free
    path for heterogeneous property bags (vs the fixed-schema struct)."""
    ev = read_table(spark, sf_dir, "events")
    # parse to map<string,STRING> (a bad value type would null the whole
    # map under map<string,int>), then try_cast values per entry
    m = F.from_json("props", "map<string,string>")
    kv = ev.select(F.explode(m).alias("key", "raw_value")).select(
        "key", F.col("raw_value").try_cast("int").alias("value")
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def json_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9d — Spark 4 VARIANT surface: ``try_parse_json`` into a variant
    column (binary-encoded semi-structured value — fields extract without
    re-parsing the text, the at-scale answer to repeated
    ``get_json_object`` calls on the same blob), then typed
    ``variant_get`` extraction and validity flags, aggregated per type.
    Oracle: the same extraction via DuckDB's JSON type."""
    ev = read_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    extracted = ev.select(
        "event_type",
        F.variant_get(v, "$.k", "int").alias("k"),
        (~F.is_variant_null(v) & v.isNotNull()).alias("valid"),
    )
    return (
        extracted.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("valid").cast("long")).alias("n_valid"),
            F.count("k").alias("n_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "json_variant_ops": json_variant_ops,
    "json_extract_props": json_extract_props,
    "json_from_json_struct": json_from_json_struct,
    "json_map_explode": json_map_explode,
}

ORACLE = {
    "json_variant_ops": (
        "SELECT event_type, COUNT(*) AS n_rows, "
        "CAST(SUM(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_valid, "
        "COUNT(CASE WHEN json_valid(props) THEN "
        "TRY_CAST(json_extract_string(props, '$.k') AS INT) END) AS n_k, "
        "CAST(SUM(CASE WHEN json_valid(props) THEN "
        "TRY_CAST(json_extract_string(props, '$.k') AS INT) END) AS BIGINT) "
        "AS sum_k "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    "json_extract_props": (
        "SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k, "
        "MIN(k) AS min_k, MAX(k) AS max_k FROM ("
        "SELECT event_type, "
        "CASE WHEN json_valid(props) THEN "
        "TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k "
        "FROM events) GROUP BY 1"
    ),
    # malformed mirrors Spark's from_json semantics: NULL struct for
    # anything that is not a JSON OBJECT (including valid arrays/scalars).
    # CASE (not AND) forces json_valid to gate json_* calls — DuckDB's
    # JSON functions hard-error on invalid input and AND does not
    # short-circuit; TRY_CAST mirrors null-on-uncastable field values.
    "json_from_json_struct": (
        "SELECT event_id, "
        "CASE WHEN json_valid(props) THEN "
        "TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k, "
        "CASE WHEN NOT json_valid(props) THEN 1 "
        "WHEN json_type(props) = 'OBJECT' THEN 0 ELSE 1 END "
        "AS malformed FROM events"
    ),
    # drop-malformed semantics mirror Spark (explode of a NULL map skips
    # the row): only valid JSON objects contribute. Staged CTEs keep
    # json_type/CAST behind the json_valid filter (DuckDB JSON functions
    # hard-error on invalid input).
    "json_map_explode": (
        "WITH valid AS (SELECT props FROM events WHERE json_valid(props)), "
        "obj AS (SELECT CAST(props AS JSON) AS j FROM valid "
        "WHERE json_type(props) = 'OBJECT'), "
        # ->> with a string operand is a LITERAL key lookup (not a JSONPath),
        # so keys containing '.', '[' or quotes extract identically to
        # Spark's explode(map) — path concatenation would misread them
        "kv AS (SELECT t.key, TRY_CAST(e.j ->> t.key AS INT) AS value "
        "FROM obj e, UNNEST(json_keys(e.j)) AS t(key)) "
        "SELECT key, COUNT(*) AS n, CAST(SUM(value) AS BIGINT) AS sum_value, "
        "MIN(value) AS min_value, MAX(value) AS max_value FROM kv GROUP BY 1"
    ),
}
