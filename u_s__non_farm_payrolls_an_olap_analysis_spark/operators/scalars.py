"""Scalar-function showcase (SURVEY §2.8 F1–F8) and array-typed column ops.

The F-row expressions live in ``functions/timeparts.py`` and are exercised
all over the query pack; this module makes their coverage *explicit* with
one oracle-checked projection per family, so the operator-inventory
check can see each scalar function produce hash-identical results in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeparts import (
    month_name,
    month_of,
    months_between_int,
    quarter_of,
    year_of,
)
from ..functions.numerics import davg, davg_sql, dsum, dsum_sql
from ..functions.vectors import l2_norm
from ..io import read_table


def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1–F7 in one per-row projection over orders: date extraction
    (F1–F3), month-name formatting (F4), exact month arithmetic (F5),
    percent/floor math (F6), CASE-WHEN bucketing (F7 — the displayed-SQL
    variant with ELSE 'Other', complementing the total-function decade of
    A4)."""
    df = read_table(spark, sf_dir, "orders")
    year = year_of("o_orderdate")
    return df.select(
        "o_orderkey",
        year.alias("year"),
        quarter_of("o_orderdate").alias("quarter"),
        month_of("o_orderdate").alias("month"),
        month_name("o_orderdate").alias("month_name"),
        months_between_int(
            F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")
        ).alias("months_to_2002"),
        F.round(F.col("o_totalprice") * 100.0 / 1000000.0, 6).alias("pct_of_1m"),
        (F.floor(year / 10) * 10).cast("int").alias("decade_num"),
        F.when(year.between(1990, 1999), F.lit("1990s"))
        .when(year.between(2000, 2009), F.lit("2000s"))
        .otherwise(F.lit("Other"))
        .alias("decade_case"),
    )


def datetime_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-arithmetic family over orders: month addition with
    end-of-month clamping (`add_months` — both engines clamp Jan 31 + 1mo
    to Feb's last day), whole-day difference, last day of month, ISO week,
    and day-of-week (aligned to DuckDB's Sunday=0 by subtracting 1 from
    Spark's Sunday=1). All results emitted as TIMESTAMP/INT — pure
    per-row projection, codegen'd end to end."""
    df = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return df.select(
        "o_orderkey",
        F.add_months(d, 3).cast("timestamp_ntz").alias("plus_3_months"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp_ntz")).alias(
            "days_since_1995"
        ),
        F.last_day(d).cast("timestamp_ntz").alias("end_of_month"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        (F.dayofweek(d) - 1).cast("int").alias("dow_sun0"),
        F.date_trunc("quarter", d).cast("timestamp_ntz").alias("quarter_start"),
    )


def str_format_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — display formatting of aggregate numbers (reference
    `dashboard_nfp.py:295-296,344`: `'{:,.0f}'.format(total)` and
    `'{:,.2f}%'.format(pct_change)`): thousands-separated integer display
    and a 2-dp percent string, as pure codegen string expressions.

    Determinism: each number is pre-rounded (HALF_UP, identical in both
    engines) BEFORE formatting, so `format_number`'s Java DecimalFormat
    and DuckDB's fmt-based `format()` see the same tie-free double and
    emit identical text."""
    df = read_table(spark, sf_dir, "orders")
    yearly = (
        df.groupBy(year_of("o_orderdate").alias("year"))
        .agg(F.round(dsum("o_totalprice"), 4).alias("revenue"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("year")  # ≤ a few dozen rows post-aggregate
    prev = F.lag("revenue").over(w)
    yoy = F.round((F.col("revenue") - prev) / prev * 100.0, 2)
    return (
        yearly.select("year", "revenue", yoy.alias("yoy_pct"))
        .select(
            "year",
            "revenue",
            F.format_number(F.round("revenue").cast("long"), 0).alias(
                "revenue_display"
            ),
            "yoy_pct",
            F.when(
                F.col("yoy_pct").isNotNull(),
                F.concat(F.format_number(F.col("yoy_pct"), 2), F.lit("%")),
            ).alias("yoy_display"),
        )
    )


def array_stats_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY<FLOAT> column ops (SURVEY §2.8 extension): per-label vector
    statistics — element access, L2 norm via zip_with/aggregate, array
    size — aggregated relationally."""
    emb = read_table(spark, sf_dir, "embeddings")
    norm = l2_norm(F.col("embedding"))
    return (
        emb.select(
            "label",
            F.size("embedding").alias("dim"),
            norm.alias("norm"),
            F.element_at("embedding", 1).cast("double").alias("first_elem"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("dim").alias("min_dim"),
            F.max("dim").alias("max_dim"),
            F.round(davg(F.col("norm"), scale=1_000_000), 6).alias("avg_norm"),
            F.round(F.min("first_elem"), 6).alias("min_first"),
            F.round(F.max("first_elem"), 6).alias("max_first"),
        )
    )


def array_explode_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER explode semantics — the row-preserving variant plain explode
    lacks: ``posexplode_outer`` keeps a (NULL pos, NULL token) row for
    NULL and EMPTY arrays instead of dropping the parent row (exactly the
    rows a plain explode silently loses in a cleaning pipeline). Array per
    doc: NULL for doc_id%10=0, empty for %10=1, else the first 3 tokens;
    positions are 0-based in both engines' emitted column."""
    docs = read_table(spark, sf_dir, "documents")
    arr = (
        F.when(F.col("doc_id") % 10 == 0, F.lit(None).cast("array<string>"))
        .when(F.col("doc_id") % 10 == 1, F.array().cast("array<string>"))
        .otherwise(F.slice(F.split(F.col("text"), " "), 1, 3))
    )
    return docs.select(
        "doc_id", F.posexplode_outer(arr).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "token")


QUERIES = {
    "scalar_functions_showcase": scalar_functions_showcase,
    "datetime_functions_showcase": datetime_functions_showcase,
    "str_format_display": str_format_display,
    "array_stats_by_label": array_stats_by_label,
    "array_explode_variants": array_explode_variants,
}

_NORM = (
    "sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), "
    "CAST(embedding AS DOUBLE[])))"
)

ORACLE = {
    "array_explode_variants": (
        "WITH d AS (SELECT doc_id, CASE "
        "WHEN doc_id % 10 = 0 THEN NULL "
        "WHEN doc_id % 10 = 1 THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split(text, ' ')[1:3] END AS arr FROM documents) "
        "SELECT doc_id, CAST(i AS INT) AS pos, arr[CAST(i + 1 AS INT)] AS token "
        "FROM d, UNNEST(range(0, COALESCE(len(arr), 0))) AS t(i) "
        "UNION ALL "
        "SELECT doc_id, NULL, NULL FROM d "
        "WHERE arr IS NULL OR len(arr) = 0"
    ),
    "datetime_functions_showcase": (
        "SELECT o_orderkey, "
        "o_orderdate + INTERVAL 3 MONTH AS plus_3_months, "
        "CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) "
        "AS days_since_1995, "
        "CAST(last_day(o_orderdate) AS TIMESTAMP) AS end_of_month, "
        "CAST(weekofyear(o_orderdate) AS INT) AS iso_week, "
        "CAST(dayofweek(o_orderdate) AS INT) AS dow_sun0, "
        "date_trunc('quarter', o_orderdate) AS quarter_start "
        "FROM orders"
    ),
    "scalar_functions_showcase": (
        "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS year, "
        "CAST(quarter(o_orderdate) AS INT) AS quarter, "
        "CAST(month(o_orderdate) AS INT) AS month, "
        "monthname(o_orderdate) AS month_name, "
        "CAST((2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS INT) "
        "AS months_to_2002, "
        "ROUND(o_totalprice * 100.0 / 1000000.0, 6) AS pct_of_1m, "
        "CAST(FLOOR(year(o_orderdate) / 10) * 10 AS INT) AS decade_num, "
        "CASE WHEN year(o_orderdate) BETWEEN 1990 AND 1999 THEN '1990s' "
        "WHEN year(o_orderdate) BETWEEN 2000 AND 2009 THEN '2000s' "
        "ELSE 'Other' END AS decade_case "
        "FROM orders"
    ),
    # yoy uses printf (no grouping): |pct| < 1000 on every fixture, so
    # Spark's grouping format_number emits the same separator-free text.
    "str_format_display": (
        "WITH y AS (SELECT CAST(year(o_orderdate) AS INT) AS year, "
        f"ROUND({dsum_sql('o_totalprice')}, 4) AS revenue "
        "FROM orders GROUP BY 1), "
        "p AS (SELECT year, revenue, "
        "ROUND((revenue - LAG(revenue) OVER (ORDER BY year)) / "
        "LAG(revenue) OVER (ORDER BY year) * 100.0, 2) AS yoy_pct FROM y) "
        "SELECT year, revenue, "
        "format('{:,}', CAST(ROUND(revenue) AS BIGINT)) AS revenue_display, "
        "yoy_pct, "
        "CASE WHEN yoy_pct IS NULL THEN NULL "
        "ELSE printf('%.2f', yoy_pct) || '%' END AS yoy_display "
        "FROM p"
    ),
    "array_stats_by_label": (
        "SELECT label, COUNT(*) AS n_vecs, "
        "MIN(len(embedding)) AS min_dim, MAX(len(embedding)) AS max_dim, "
        f"ROUND({davg_sql(_NORM, scale=1_000_000)}, 6) AS avg_norm, "
        "ROUND(MIN(CAST(embedding[1] AS DOUBLE)), 6) AS min_first, "
        "ROUND(MAX(CAST(embedding[1] AS DOUBLE)), 6) AS max_first "
        "FROM embeddings GROUP BY 1"
    ),
}


def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe scalar family (Spark 4 ships with ANSI ON, so
    the ``try_*`` forms are the survival kit for dirty data): ``try_cast``
    on uncastable prefixes, ``try_divide`` on zero denominators,
    ``try_element_at`` past the end of an array — each yields NULL where
    the plain form would ABORT THE JOB at 100 TB scan scale. Oracle:
    DuckDB ``TRY_CAST`` / guarded CASE division / out-of-range list index
    (NULL by definition there)."""
    docs = read_table(spark, sf_dir, "documents")
    # the STRING-to-INT grammars of the two engines' try-casts differ
    # (DuckDB TRY_CAST accepts '12.5'/'1e+4'/'0x1f' and rounds, Spark
    # rejects all three) — an integer-literal regexp guard on BOTH sides
    # pins the shared domain, where parse and int32-overflow behavior
    # are identical. The guarded value is the FIRST TOKEN (not a fixed
    # 4-char prefix) so the hostile fixture's 11-digit row actually
    # reaches try_cast and overflows int32 → NULL in both engines
    # (round-9 ADVICE: at width 4 the overflow claim was unreachable).
    # Anchors are \\A..\\z, NOT ^..$: Java-regex '$' matches BEFORE a
    # final newline while RE2 (DuckDB) '$' is end-of-text only, so a
    # token like '123\\n' would pass the Spark guard but fail the DuckDB
    # one (round-10 ADVICE); \\A/\\z mean end-of-text in BOTH engines.
    sub = F.substring_index("text", " ", 1)
    return docs.select(
        "doc_id",
        F.when(sub.rlike(r"\A[+-]?[0-9]+\z"), sub.try_cast("int")).alias(
            "try_int"
        ),
        F.try_divide(
            F.col("n_chars").cast("double"),
            (F.col("doc_id") % 3).cast("double"),
        ).alias("safe_ratio"),
        F.try_element_at(F.split(F.col("text"), " "), F.lit(1000)).alias(
            "token_1000"
        ),
    )


def array_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — lambda expressions evaluated INSIDE
    codegen, the idiomatic alternative to exploding + re-aggregating
    (zero shuffle, zero row-count blowup; the explode formulation of the
    same stats shuffles corpus x tokens rows): ``filter`` (long-token
    count), ``transform`` + ``aggregate`` (total token length),
    ``transform`` + ``array_max``. Oracle: DuckDB's list lambda family
    (``list_filter`` / ``list_transform`` / ``list_aggregate`` /
    ``list_max``) — same semantics, shared lambda arrow syntax."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = F.split(F.col("text"), " ")
    lens = F.transform(toks, lambda w: F.length(w))
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda w: F.length(w) > 3))
        .cast("long")
        .alias("n_long_tokens"),
        F.aggregate(lens, F.lit(0), lambda a, x: a + x)
        .cast("long")
        .alias("sum_token_len"),
        F.array_max(lens).cast("long").alias("max_token_len"),
    )


QUERIES["scalar_try_functions"] = scalar_try_functions
QUERIES["array_higher_order_funcs"] = array_higher_order_funcs

ORACLE["scalar_try_functions"] = (
    "SELECT doc_id, CASE WHEN regexp_matches(split_part(text, ' ', 1), "
    r"'\A[+-]?[0-9]+\z') THEN TRY_CAST(split_part(text, ' ', 1) AS INT) END "
    "AS try_int, "
    "CASE WHEN CAST(doc_id % 3 AS DOUBLE) = 0 THEN NULL "
    "ELSE CAST(n_chars AS DOUBLE) / CAST(doc_id % 3 AS DOUBLE) END "
    "AS safe_ratio, "
    "string_split(text, ' ')[1000] AS token_1000 FROM documents"
)

ORACLE["array_higher_order_funcs"] = (
    "SELECT doc_id, "
    "CAST(length(list_filter(string_split(text, ' '), "
    "w -> length(w) > 3)) AS BIGINT) AS n_long_tokens, "
    "CAST(list_aggregate(list_transform(string_split(text, ' '), "
    "w -> length(w)), 'sum') AS BIGINT) AS sum_token_len, "
    "CAST(list_max(list_transform(string_split(text, ' '), "
    "w -> length(w))) AS BIGINT) AS max_token_len "
    "FROM documents WHERE text IS NOT NULL"
)
