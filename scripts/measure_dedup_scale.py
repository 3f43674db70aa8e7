"""Sub-quadratic evidence for the dedup pack (SCALE.md).

For a given sf_dir, measures what the SCALE.md argument asserts: every
near-dup path's CANDIDATE set (the rows the exact verify stage must
touch) is a vanishing fraction of the n*(n-1)/2 all-pairs space, and
``dedup_clusters`` converges in ~diameter rounds. Prints one JSON line.

Usage: python scripts/measure_dedup_scale.py [/root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table  # noqa: E402
from u_s__non_farm_payrolls_an_olap_analysis_spark.operators import dedup  # noqa: E402
from u_s__non_farm_payrolls_an_olap_analysis_spark.session import get_spark  # noqa: E402


def minhash_candidates(docs):
    """Candidate stage of dedup_minhash_near (same code path, pre-verify)."""
    sh = dedup._shingles(docs)
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(dedup.MINHASH_PERMS)
        ]
    )
    bands = None
    for band in range(dedup.LSH_BANDS):
        cols = [
            F.col(f"h{band * dedup.LSH_ROWS + r}") for r in range(dedup.LSH_ROWS)
        ]
        part = sig.select(
            "doc_id", F.lit(band).alias("band"), F.xxhash64(*cols).alias("band_sig")
        )
        bands = part if bands is None else bands.unionByName(part)
    ca, cb = bands.alias("ca"), bands.alias("cb")
    return (
        ca.join(
            cb,
            (F.col("ca.band") == F.col("cb.band"))
            & (F.col("ca.band_sig") == F.col("cb.band_sig"))
            & (F.col("ca.doc_id") < F.col("cb.doc_id")),
        )
        .select(F.col("ca.doc_id").alias("a"), F.col("cb.doc_id").alias("b"))
        .distinct()
    )


def rhp_candidates(emb, bands=None, rows=None):
    """Candidate stage of dedup_embedding_cosine (pre-verify). bands/rows
    default to the registered operator's; pass e.g. (12, 8) to measure the
    high-threshold production banding (candidate volume is independent of
    the verify threshold — only banding geometry sets it)."""
    bands = dedup.RHP_BANDS if bands is None else bands
    rows = dedup.RHP_ROWS if rows is None else rows
    bits = emb.select("vec_id", dedup._rhp_bits(F.col("embedding")).alias("bits"))

    def band_sig(b):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(rows - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc * 2
            + F.element_at(F.col("bits"), b * F.lit(rows) + j + 1),
        )

    sigs = bits.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), band_sig(b).alias("band_sig")),
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.band_sig")
    ca, cb = sigs.alias("ca"), sigs.alias("cb")
    return (
        ca.join(
            cb,
            (F.col("ca.band") == F.col("cb.band"))
            & (F.col("ca.band_sig") == F.col("cb.band_sig"))
            & (F.col("ca.vec_id") < F.col("cb.vec_id")),
        )
        .select(F.col("ca.vec_id").alias("a"), F.col("cb.vec_id").alias("b"))
        .distinct()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="measure_dedup_scale")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    n_docs = docs.count()
    n_vecs = emb.count()
    out: dict = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "all_pairs_docs": n_docs * (n_docs - 1) // 2,
        "n_vecs": n_vecs,
        "all_pairs_vecs": n_vecs * (n_vecs - 1) // 2,
    }

    t = time.time()
    out["shingle_block_candidates"] = dedup._jaccard_pairs(docs).count()
    out["shingle_block_sec"] = round(time.time() - t, 2)

    t = time.time()
    out["minhash_candidates"] = minhash_candidates(docs).count()
    out["minhash_sec"] = round(time.time() - t, 2)

    t = time.time()
    out["rhp_candidates"] = rhp_candidates(emb).count()
    out["rhp_sec"] = round(time.time() - t, 2)

    t = time.time()
    out["rhp12x8_candidates"] = rhp_candidates(emb, bands=12, rows=8).count()
    out["rhp12x8_sec"] = round(time.time() - t, 2)

    t = time.time()
    clusters = dedup.dedup_clusters(spark, sf_dir)
    out["cluster_rows"] = clusters.count()
    out["clusters_sec"] = round(time.time() - t, 2)
    out["cluster_rounds"] = dedup.LAST_CLUSTER_ROUNDS

    for k in ("shingle_block", "minhash"):
        out[f"{k}_frac_of_n2"] = round(
            out[f"{k}_candidates"] / max(1, out["all_pairs_docs"]), 6
        )
    out["rhp_frac_of_n2"] = round(
        out["rhp_candidates"] / max(1, out["all_pairs_vecs"]), 6
    )
    out["rhp12x8_frac_of_n2"] = round(
        out["rhp12x8_candidates"] / max(1, out["all_pairs_vecs"]), 6
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
