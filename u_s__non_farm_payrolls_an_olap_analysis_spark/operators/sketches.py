"""Mergeable-aggregate surfaces: bitmap exact-distinct and HLL sketches.

The at-scale pattern for distinct counts is NOT re-scanning raw data per
query — it is maintaining *mergeable partial aggregates* (a bitmap or HLL
sketch per partition/day), unioning partials, and estimating from the
merged state. Spark 4 ships both:

- **Bitmaps** (`bitmap_construct_agg` / `bitmap_or_agg` / `bitmap_count`):
  EXACT distinct counts over integer keys, re-aggregatable across any
  grouping — the rollup-friendly replacement for COUNT(DISTINCT), whose
  partials (sets) famously don't merge. Oracle: plain COUNT(DISTINCT).
- **HLL sketches** (`hll_sketch_agg` / `hll_union_agg` /
  `hll_sketch_estimate`): fixed-size approximate state for when even
  bitmaps are too big (arbitrary-typed keys, billions of distincts).
  Sketch bytes are engine-specific → rows-only in the registry; the
  accuracy statement is the tolerance test against the exact count
  (`tests/test_dedup_similarity.py` pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct customers per year AND overall via mergeable
    bitmaps: per-(year, bucket) partials → OR-merge → popcount. The
    two-level shape is the point — the per-year partials REUSE into the
    overall count by re-merging, which COUNT(DISTINCT) partials cannot."""
    orders = read_table(spark, sf_dir, "orders")
    pos = F.bitmap_bit_position("o_custkey")
    bucket = F.bitmap_bucket_number("o_custkey")
    partials = (
        orders.select(
            F.year("o_orderdate").alias("year"),
            bucket.alias("bkt"),
            pos.alias("pos"),
        )
        .groupBy("year", "bkt")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    per_year = (
        partials.groupBy("year")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_distinct_customers"))
    )
    overall = (
        partials.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n_distinct_customers"))
        .select(F.lit(-1).cast("int").alias("year"), "n_distinct_customers")
    )
    return per_year.select(
        F.col("year").cast("int").alias("year"), "n_distinct_customers"
    ).unionByName(overall).orderBy("year")


def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch per year, unioned to a grand-total estimate — the
    fixed-memory path when keys are arbitrary-typed or bitmap ranges are
    impractical. Rows-only: sketch internals are engine-specific; the
    accuracy bound is tested against the exact count."""
    orders = read_table(spark, sf_dir, "orders")
    sketches = orders.groupBy(F.year("o_orderdate").alias("year")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    per_year = sketches.select(
        F.col("year").cast("int").alias("year"),
        F.hll_sketch_estimate("sk").alias("approx_distinct"),
    )
    overall = sketches.agg(
        F.hll_union_agg("sk").alias("sk")
    ).select(
        F.lit(-1).cast("int").alias("year"),
        F.hll_sketch_estimate("sk").alias("approx_distinct"),
    )
    return per_year.unionByName(overall).orderBy("year")


QUERIES = {
    "agg_bitmap_distinct": agg_bitmap_distinct,
    "agg_hll_sketch_merge": agg_hll_sketch_merge,
}

ORACLE = {
    "agg_bitmap_distinct": (
        "SELECT CAST(year(o_orderdate) AS INT) AS year, "
        "COUNT(DISTINCT o_custkey) AS n_distinct_customers "
        "FROM orders GROUP BY 1 "
        "UNION ALL "
        "SELECT -1 AS year, COUNT(DISTINCT o_custkey) FROM orders "
        "ORDER BY 1"
    ),
}
