"""The `observe` API: pipeline-health metrics piggybacked on a real action
— the zero-extra-pass alternative to running a separate DQ query (at
100 TB a second profiling scan of the input is a second 100 TB read)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table

SF = "/root/testdata/sf0.001"


def test_observe_piggybacks_metrics_on_action(spark):
    obs = Observation("orders_profile")
    orders = read_table(spark, SF, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("null_keys"),
        F.min("o_orderdate").alias("min_date"),
    )
    result = orders.groupBy("o_orderstatus").count().collect()
    metrics = obs.get
    assert metrics["n_rows"] == sum(r["count"] for r in result)
    assert metrics["null_keys"] == 0
    assert metrics["min_date"] is not None
