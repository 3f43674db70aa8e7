"""Driver-contract invariants: the registry is what the harness grades."""

from __future__ import annotations

from u_s__non_farm_payrolls_an_olap_analysis_spark import registry


def test_registry_shape():
    q = registry.queries()
    o = registry.oracle_sql()
    assert len(q) >= 44
    assert set(o) <= set(q)
    for name, fn in q.items():
        assert callable(fn), name
    # rows-only ops are the documented engine-specific-hash ones
    rows_only = set(q) - set(o)
    assert rows_only <= {"dedup_minhash_near", "dedup_simhash",
                         "dedup_embedding_cosine",
                         "agg_approx_count_distinct",
                         "agg_approx_percentiles",
                         "sim_search_ann_ivf_kmeans",
                         "agg_hll_sketch_merge"}


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"year", "avg_totalprice"}
