"""Bench provenance: every scale section's JSON must carry the row
counts its ratios were measured on (r9 verdict item 5 — the round-8
'100x' retraction was computed against a bench dir that actually held
~1x rows; `table_rows` in the section output makes that class of error
structurally impossible to repeat).
"""

from __future__ import annotations

import duckdb
import pytest

import bench
from tests.conftest import SF_SMOKE


def test_table_rows_matches_duckdb_counts():
    """_table_rows reads footer metadata only — it must agree with a real
    count over the same files."""
    rows = bench._table_rows(SF_SMOKE, ("orders", "lineitem", "events"))
    assert set(rows) == {"orders", "lineitem", "events"}
    con = duckdb.connect()
    for t, n in rows.items():
        (real,) = con.execute(
            f"SELECT COUNT(*) FROM '{SF_SMOKE}/{t}.parquet'"
        ).fetchone()
        assert n == real > 0, (t, n, real)
    con.close()


def test_table_rows_missing_table_omitted(tmp_path):
    assert bench._table_rows(str(tmp_path), ("orders",)) == {}


@pytest.fixture()
def _mini_bench(monkeypatch, tmp_path):
    """Shrink the bench sections to one light query / one timed run and
    point the generated dirs at tmp so the sections run in seconds."""
    monkeypatch.setattr(bench, "SCALE_RUNS", 1)
    monkeypatch.setattr(
        bench, "HEADLINE", {"join_agg_pricing": "join_agg_pricing"}
    )
    monkeypatch.setattr(
        bench, "SFN_QUERIES", {"join_agg_pricing": "join_agg_pricing"}
    )
    monkeypatch.setattr(bench, "SF1_DIRNAME", str(tmp_path / "mini_sf1"))
    return tmp_path


def test_sf1_section_emits_table_rows(spark, _mini_bench):
    out = bench._sf1_section(spark, SF_SMOKE)
    assert "error" not in out, out
    # replicated facts: rep x the base row counts, straight from footers
    base = bench._table_rows(SF_SMOKE, ("orders", "lineitem", "events"))
    assert out["table_rows"] == {
        t: n * bench.SF1_REP for t, n in base.items()
    }


def test_sfn_section_emits_table_rows(spark, _mini_bench):
    out = bench._sfn_section(
        spark,
        SF_SMOKE,
        sf1={},
        rep=2,
        dirname=str(_mini_bench / "mini_sfn"),
        include_docs=False,
    )
    assert "error" not in out, out
    base = bench._table_rows(
        SF_SMOKE, ("orders", "lineitem", "events", "documents")
    )
    # facts replicate at rep; the round-12 docs-trajectory corpus
    # (quality_gopher_rules at the section's rep) adds a rep-matched
    # documents row to the same provenance dict
    assert out["table_rows"] == {t: n * 2 for t, n in base.items()}
