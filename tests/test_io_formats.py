"""Source/sink format breadth: the engine's IO layer is format-agnostic
Spark — verify CSV and JSON roundtrips preserve the monthly-series
semantics (the reference only ever had PostgreSQL; Parquet is the engine's
at-rest default, CSV/JSON are the interchange formats)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _series_df(spark):
    rows = [
        (dt.datetime(2020, m, 1), 100.0 + m) for m in range(1, 13)
    ]
    return spark.createDataFrame(rows, "date timestamp, employment double")


def test_csv_roundtrip(spark, tmp_path):
    df = _series_df(spark)
    path = str(tmp_path / "series_csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema("date timestamp, employment double")
        .csv(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, tmp_path):
    df = _series_df(spark)
    path = str(tmp_path / "series_json")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema("date timestamp, employment double").json(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_parquet_prunes(spark, tmp_path):
    """Year-partitioned layout (SURVEY §2.10 scale note): a year filter
    reads only that year's directory."""
    df = _series_df(spark).withColumn("year", F.year("date"))
    extra = df.withColumn("date", F.expr("date + INTERVAL 1 YEAR")).withColumn(
        "year", F.year("date")
    )
    path = str(tmp_path / "part")
    df.unionByName(extra).write.mode("overwrite").partitionBy("year").parquet(path)
    back = spark.read.parquet(path).filter(F.col("year") == 2020)
    assert back.count() == 12
    from u_s__non_farm_payrolls_an_olap_analysis_spark.plans.explain import (
        formatted_plan,
    )
    # partition pruning shows in the scan's partition filters
    assert "PartitionFilters" in formatted_plan(back)


def test_orc_roundtrip(spark, tmp_path):
    """ORC is the second columnar at-rest format Spark ships natively —
    same writer/reader surface as parquet (predicate pushdown included)."""
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "k long, s string, v double"
    )
    path = str(tmp_path / "t_orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert sorted((r["k"], r["s"], r["v"]) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, "b", 2.5),
    ]


def _jdbc_driver_available(spark) -> bool:
    """Capability probe (same pattern as the TWS protobuf gate): True iff
    an embedded JDBC driver is loadable in the JVM. Spark bundles Derby
    for the Hive metastore, so this is expected-present; the skip exists
    so environments that strip Derby get a pinned, visible gate instead
    of an error."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.derby.iapi.jdbc.AutoloadedDriver"
        )
        return True
    except Exception:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.derby.jdbc.EmbeddedDriver"
            )
            return True
        except Exception:
            return False


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """Real JDBC connector exercise (SURVEY §1.4: `spark.read.jdbc`
    retained as optional connector; reference storage is PostgreSQL via
    psycopg2, `etl.py:48-63`): write a keyed series to an embedded Derby
    database through df.write.jdbc, read it back through spark.read.jdbc,
    and verify values — the full JDBC write + read path with no external
    server. Derby's EmbeddedDriver ships in Spark's own classpath."""
    import pytest

    if not _jdbc_driver_available(spark):
        pytest.skip("no embedded JDBC driver (Derby) on the JVM classpath")
    url = f"jdbc:derby:{tmp_path}/nfpdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = _series_df(spark)
    df.write.jdbc(url, "nonfarm_payrolls", mode="overwrite", properties=props)
    back = spark.read.jdbc(url, "nonfarm_payrolls", properties=props)
    assert set(back.columns) == {"date", "employment"}
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # predicate pushdown reaches the JDBC source (shows as an external
    # engine filter, not a Spark-side Filter over a full table pull)
    pushed = spark.read.jdbc(
        url, "nonfarm_payrolls", properties=props
    ).filter(F.col("employment") > 106.0)
    assert pushed.count() == 6
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "employment" in plan


def test_xml_roundtrip_with_nested_struct(spark, tmp_path):
    """Spark 4 native XML source (built-in since 4.0; the spark-xml
    lineage): write rows with a NESTED struct — the shape XML represents
    naturally and flat formats cannot — read them back with an explicit
    schema, and verify values and that a filter is applied on the read
    path. Real connector, no stub."""
    path = str(tmp_path / "xmlout")
    df = spark.createDataFrame(
        [(1, ("alpha", 10.5)), (2, ("beta", 20.25)), (3, ("gamma", 30.0))],
        "id int, meta struct<name:string, score:double>",
    )
    df.write.mode("overwrite").format("xml").option("rowTag", "rec").save(
        path
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "rec")
        .schema("id int, meta struct<name:string, score:double>")
        .load(path)
    )
    assert sorted(
        (r["id"], r["meta"]["name"], r["meta"]["score"])
        for r in back.collect()
    ) == [(1, "alpha", 10.5), (2, "beta", 20.25), (3, "gamma", 30.0)]
    assert sorted(
        r["id"] for r in back.filter(F.col("meta.score") > 15).collect()
    ) == [2, 3]


def test_text_source_line_roundtrip(spark, tmp_path):
    """spark.read.text — the raw-corpus ingestion path (one line = one
    value row, the shape web-text dumps arrive in before parsing):
    write lines, read back, parse with from_csv, verify."""
    path = str(tmp_path / "textout")
    df = _series_df(spark)
    df.selectExpr(
        "concat(date_format(date, 'yyyy-MM-dd'), '|', employment) AS value"
    ).write.mode("overwrite").text(path)
    back = spark.read.text(path).selectExpr(
        "split(value, '\\\\|')[0] AS d",
        "CAST(split(value, '\\\\|')[1] AS DOUBLE) AS employment",
    )
    want = sorted(
        (r["date"].strftime("%Y-%m-%d"), r["employment"])
        for r in df.collect()
    )
    assert sorted(map(tuple, back.collect())) == want


def test_avro_capability_gate(spark, tmp_path):
    """Avro is an EXTERNAL module (spark-avro jar) not shipped in this
    container; pin that the exclusion is environmental, mirroring the
    TWS/protobuf gate: if the jar ever appears, the roundtrip must pass
    — otherwise the failure must be the documented missing-source error,
    not a code defect."""
    import pytest

    df = _series_df(spark)
    path = str(tmp_path / "avroout")
    try:
        df.write.mode("overwrite").format("avro").save(path)
    except Exception as e:
        assert "Failed to find data source: avro" in str(e).replace(
            "\n", " "
        ), f"unexpected avro failure mode: {e}"
        pytest.skip("spark-avro jar absent in this environment")
    back = spark.read.format("avro").load(path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
