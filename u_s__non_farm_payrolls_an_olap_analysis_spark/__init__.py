"""PySpark-native OLAP analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo
``immanuel30blr/U.S.-Non-Farm-Payrolls-An-OLAP-Analysis`` (a pandas +
PostgreSQL + Streamlit OLAP dashboard over a monthly time series), extended
with the LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB-scale execution.

Layout
------
- ``session``    : SparkSession builder with scale-ready defaults (AQE, Arrow).
- ``io``         : Parquet readers for the star schema; keyed-upsert writer.
- ``functions/`` : reusable Catalyst expression builders (time parts, vector
                   math, text normalization).
- ``operators/`` : the query pack — every operator from SURVEY.md §2, each a
                   pure ``(spark, sf_dir) -> DataFrame`` function.
- ``streaming/`` : Structured Streaming operators over the events table.
- ``plans/``     : plan-inspection helpers (pushdown / broadcast assertions).
- ``registry``   : assembles the ``queries()`` / ``oracle_sql()`` contract.
"""

__version__ = "0.1.0"


def get_spark(*args, **kwargs):
    """Convenience re-export of :func:`session.get_spark` (lazy import so
    ``import u_s__non_farm_payrolls_an_olap_analysis_spark`` stays cheap)."""
    from .session import get_spark as _g

    return _g(*args, **kwargs)


def queries():
    """Convenience re-export of :func:`registry.queries`."""
    from .registry import queries as _q

    return _q()


def oracle_sql():
    """Convenience re-export of :func:`registry.oracle_sql`."""
    from .registry import oracle_sql as _o

    return _o()
