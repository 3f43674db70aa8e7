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


# --- Count-min sketch (portable, oracle-checked) ---------------------------

CMS_W = 256               # counters per hash row
CMS_D = 4                 # independent hash rows
CMS_PROBE_LO, CMS_PROBE_HI = 1, 20  # custkeys probed through the sketch


def _cms_bucket(d_col, key_col):
    """Portable CMS hash: first 8 hex chars of md5('cms<d>:<key>') mod W.
    md5 produces identical bytes in Spark and DuckDB (the
    ``corpus_shuffle_shards`` device), so the whole sketch CONTENT is
    cross-engine deterministic — unlike xxhash64/hash(), which are
    engine-specific."""
    s = F.concat(
        F.lit("cms"),
        d_col.cast("string"),
        F.lit(":"),
        key_col.cast("string"),
    )
    return (F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % CMS_W)


def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch as DATA (Cormode & Muthukrishnan 2005): the d×w
    counter matrix is a (d, bucket, count) TABLE built by one
    explode(d) → groupBy aggregate (map-side combined — the sketch IS a
    mergeable partial aggregate, so per-partition/day sketches union by
    adding counters), and point queries are a broadcast probe join +
    min-over-d. Frequencies of probed keys are OVERESTIMATES (collisions
    only add), never under — the test asserts the bound; here w is set
    far below the key cardinality so the property is visible.

    Because the hashes are portable md5 (not engine-native xxhash), the
    ENTIRE pipeline — sketch content and query answers — is
    hash-checked against DuckDB, unlike the bytes-opaque
    ``hll_sketch_agg`` family above (rows-only). Output per probed
    custkey: exact count and CMS estimate."""
    orders = read_table(spark, sf_dir, "orders")
    ds = F.array(*[F.lit(i) for i in range(CMS_D)])
    rows = orders.select("o_custkey", F.explode(ds).alias("d"))
    sketch = (
        rows.select("d", _cms_bucket(F.col("d"), F.col("o_custkey")).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probe = (
        spark.range(CMS_PROBE_LO, CMS_PROBE_HI + 1)
        .select(F.col("id").alias("custkey"))
        .select("custkey", F.explode(ds).alias("d"))
        .select(
            "custkey", "d", _cms_bucket(F.col("d"), F.col("custkey")).alias("bucket")
        )
    )
    est = (
        probe.join(sketch, ["d", "bucket"], "left")
        .groupBy("custkey")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )
    exact = (
        orders.filter(
            F.col("o_custkey").between(CMS_PROBE_LO, CMS_PROBE_HI)
        )
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return (
        est.join(exact, "custkey", "left")
        .select(
            "custkey",
            F.coalesce("exact_n", F.lit(0)).alias("exact_n"),
            "cms_est",
        )
        .orderBy("custkey")
    )


QUERIES["agg_count_min_sketch"] = agg_count_min_sketch

_CMS_HASH = (
    "CAST(('0x' || substr(md5('cms' || CAST({d} AS VARCHAR) || ':' || "
    "CAST({k} AS VARCHAR)), 1, 8)) AS BIGINT) % " + str(CMS_W)
)

ORACLE["agg_count_min_sketch"] = (
    "WITH rows AS (SELECT o_custkey, u.d FROM orders, "
    f"UNNEST([{', '.join(str(i) for i in range(CMS_D))}]) AS u(d)), "
    "sk AS (SELECT d, "
    + _CMS_HASH.format(d="d", k="o_custkey")
    + " AS bucket, COUNT(*) AS c FROM rows GROUP BY 1, 2), "
    "probe AS (SELECT k.custkey, u.d, "
    + _CMS_HASH.format(d="u.d", k="k.custkey")
    + " AS bucket FROM (SELECT unnest(range("
    f"{CMS_PROBE_LO}, {CMS_PROBE_HI + 1})) AS custkey) k, "
    f"UNNEST([{', '.join(str(i) for i in range(CMS_D))}]) AS u(d)), "
    "est AS (SELECT custkey, MIN(COALESCE(c, 0)) AS cms_est "
    "FROM probe LEFT JOIN sk USING (d, bucket) GROUP BY 1), "
    "exact AS (SELECT o_custkey AS custkey, COUNT(*) AS n FROM orders "
    f"WHERE o_custkey BETWEEN {CMS_PROBE_LO} AND {CMS_PROBE_HI} GROUP BY 1) "
    "SELECT custkey, CAST(COALESCE(n, 0) AS BIGINT) AS exact_n, cms_est "
    "FROM est LEFT JOIN exact USING (custkey) ORDER BY custkey"
)
