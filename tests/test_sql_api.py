"""Spark SQL entry surface: the reference displays SQL it never executes
(`dashboard_nfp.py:90-97` etc.); this engine actually runs it — registered
temp views + ``spark.sql`` produce the same results as the DataFrame pack."""

from __future__ import annotations

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import register_views
from u_s__non_farm_payrolls_an_olap_analysis_spark.operators import olap

SF = "/root/testdata/sf0.001"


def test_sql_matches_dataframe_api(spark):
    register_views(spark, SF)
    sql_rows = {
        r["year"]: r["avg_totalprice"]
        for r in spark.sql(
            "SELECT CAST(year(o_orderdate) AS INT) AS year, "
            "ROUND((CAST(SUM(CAST(ROUND((o_totalprice) * 10000) AS BIGINT)) "
            "AS DOUBLE) / 10000.0 / COUNT(o_totalprice)), 4) AS avg_totalprice "
            "FROM orders GROUP BY 1"
        ).collect()
    }
    df_rows = {
        r["year"]: r["avg_totalprice"]
        for r in olap.slice_avg_by_year(spark, SF).collect()
    }
    assert sql_rows == df_rows


def test_sql_lag_window(spark):
    register_views(spark, SF)
    out = spark.sql(
        "WITH m AS (SELECT date_trunc('month', o_orderdate) AS ms, "
        "SUM(o_totalprice) AS t FROM orders GROUP BY 1) "
        "SELECT ms, (t - LAG(t) OVER (ORDER BY ms)) * 100.0 "
        "/ LAG(t) OVER (ORDER BY ms) AS pct FROM m ORDER BY ms"
    ).collect()
    assert out[0]["pct"] is None and len(out) > 12
