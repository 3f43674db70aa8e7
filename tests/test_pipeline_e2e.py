"""End-to-end LLM-data-pipeline composition: the operators are not just
individually correct — they compose into the canonical corpus-preparation
flow as ONE lazy plan (no intermediate materialization, no driver
round-trips until the final action), which is what a 100 TB pipeline
actually runs:

    raw docs → cleaning filter → exact dedup (keeper) → quality score
             → key-stable train/test split → per-split profile
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table

SF = "/root/testdata/sf0.001"


def _pipeline(spark):
    docs = read_table(spark, SF, "documents")

    # stage 1 — cleaning filter (text_clean_funnel's keep-predicate)
    n_tokens = F.size(F.split(F.col("text"), " "))
    keep = (
        F.length("text").between(20, 2000)
        & n_tokens.between(5, 500)
        & F.array_contains(F.split(F.lower(F.col("text")), " "), "the")
    )
    cleaned = docs.filter(keep)

    # stage 2 — exact dedup, min-id keeper (dedup_exact's shape)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    keepers = (
        cleaned.withColumn("fp", F.md5(norm))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # stage 3 — quality signal + split, single projection
    return keepers.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.when(F.col("doc_id") % 10 < 8, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def test_pipeline_composes_lazily_and_consistently(spark):
    out = _pipeline(spark)
    profile = {
        r["split"]: (r["n"], r["toks"])
        for r in out.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks"))
        .collect()
    }
    total = sum(n for n, _ in profile.values())
    assert total > 0
    # split is exhaustive and disjoint: profile counts sum to the dedup'd,
    # cleaned corpus size computed independently
    assert total == _pipeline(spark).count()
    # key-stability: re-running the whole pipeline yields the same profile
    rerun = {
        r["split"]: (r["n"], r["toks"])
        for r in _pipeline(spark)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks"))
        .collect()
    }
    assert profile == rerun


def test_pipeline_is_one_plan_no_collects(spark):
    """The composed pipeline stays lazy: building it triggers zero jobs
    (materialization happens only at the caller's action)."""
    sc = spark.sparkContext
    before = sc.statusTracker().getJobIdsForGroup() or []
    df = _pipeline(spark)
    after = sc.statusTracker().getJobIdsForGroup() or []
    assert len(after) == len(before)  # plan construction ran no job
    assert df.schema is not None
