"""SQL-entry operators: dialect-shared ANSI SQL, executed by ``spark.sql``.

The reference *displays* SQL it never runs (`dashboard_nfp.py:90-97,
120-130, ...` are documentation inside `st.expander` blocks); here the SQL
IS the executed path. Each query below is one ANSI string that runs
unchanged on Spark AND DuckDB — the oracle is literally the same text, so
the parity gate proves the engine's SQL front-end agrees with another
engine's on the shared dialect.

These exercise the subquery surface the DataFrame pack doesn't:
EXISTS / IN / correlated scalar subqueries, which Catalyst decorrelates
into semi joins and aggregate-joins (RewriteCorrelatedScalarSubquery) —
the scalable physical shapes, not row-at-a-time re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import register_views

SHARED_SQL = {
    # EXISTS → left-semi join after decorrelation; the inner query is never
    # materialized per-row.
    "sql_exists_big_order": (
        "SELECT c_mktsegment, COUNT(*) AS n_customers "
        "FROM customer WHERE EXISTS (SELECT 1 FROM orders "
        "WHERE o_custkey = c_custkey AND o_totalprice > 400000.0) "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    ),
    # correlated scalar subquery → aggregate + join on the correlation key.
    # The outer table is aliased and the correlation fully qualified
    # (c2.c_nationkey = c.c_nationkey): an unqualified c_nationkey inside
    # the subquery would resolve to the INNER c2 (innermost scope wins),
    # silently comparing every customer to the global average instead of
    # their nation's.
    "sql_scalar_above_nation_avg": (
        "SELECT n_name, COUNT(*) AS n_above "
        "FROM customer c JOIN nation ON c.c_nationkey = n_nationkey "
        "WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 "
        "WHERE c2.c_nationkey = c.c_nationkey) "
        "GROUP BY n_name ORDER BY n_name"
    ),
    # IN over a subquery → semi join; NOT IN deliberately avoided (its
    # three-valued NULL semantics differ from ANTI and trip users — the
    # engine's anti-join surface is join_semi_anti).
    "sql_in_subquery_region_orders": (
        "SELECT CAST(year(o_orderdate) AS INT) AS year, "
        "COUNT(*) AS n_orders "
        "FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'EUROPE') "
        "GROUP BY 1 ORDER BY 1"
    ),
}


def _run(name: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(SHARED_SQL[name])

    fn.__name__ = name
    fn.__doc__ = (
        "Dialect-shared ANSI SQL (same text is the DuckDB oracle):\n\n"
        + SHARED_SQL[name]
    )
    return fn


QUERIES = {name: _run(name) for name in SHARED_SQL}

ORACLE = dict(SHARED_SQL)
