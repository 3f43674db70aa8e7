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
                         "dedup_embedding_cosine_prod",
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


def test_sample_priority_subset_and_dedup():
    """The driver samples the FIRST 50 registry keys; a stale or mistyped
    `_SAMPLE_PRIORITY` entry would either crash queries() at driver time
    or silently waste a sample slot on a duplicate."""
    q = registry.queries()
    pri = registry._SAMPLE_PRIORITY
    assert set(pri) <= set(q), sorted(set(pri) - set(q))
    assert len(pri) == len(set(pri)), "duplicate keys in _SAMPLE_PRIORITY"
    # priority keys must actually lead the iteration order
    assert list(q)[: len(pri)] == pri


def test_every_oracle_sql_executes_in_duckdb():
    """Cheap pytest-level twin of the parity script's DuckDB half: every
    oracle string must EXECUTE against the sf0.001 views (syntax errors,
    renamed columns, dialect slips surface from `pytest` alone, without
    waiting for scripts/check_parity.py). Values are checked by the
    parity gate; here only executability and non-None cursor result."""
    import duckdb

    from u_s__non_farm_payrolls_an_olap_analysis_spark import registry

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf}/{t}.parquet')"
        )
    failures = []
    for name, sql in registry.oracle_sql().items():
        try:
            con.execute(sql).fetchall()
        except Exception as e:  # noqa: BLE001 - collect every breakage
            failures.append(f"{name}: {str(e)[:150]}")
    assert not failures, "\n".join(failures)
