"""Independent-reference tests for the round-13 ninth batch
(Brown-Forsythe, Mood's median test, Grubbs' outlier statistic, Simpson
diversity) — each operator replicated in pure python at sf0.001 (the
test_round13_ops.py device: the DuckDB oracle checks cross-engine
parity; these pin the SEMANTICS against a from-scratch implementation
that shares no code)."""

from __future__ import annotations

import collections
import math

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table

SF = "/root/testdata/sf0.001"


def _round_half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _round6(x: float) -> float:
    return _round_half_away(x * 1e6) / 1e6


def _round4(x: float) -> float:
    return _round_half_away(x * 1e4) / 1e4


def _interp_median2(vals: list[int]) -> int:
    """2x the linearly-interpolated median (Spark percentile /
    DuckDB quantile_cont convention) — always an exact integer."""
    s = sorted(vals)
    n = len(s)
    h = (n - 1) * 0.5
    lo, hi = s[int(math.floor(h))], s[int(math.ceil(h))]
    return int(2.0 * (lo + (hi - lo) * 0.5))


def _scaled_prices_by_group(spark):
    rows = (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    by_g = collections.defaultdict(list)
    for r in rows:
        by_g[r["o_orderpriority"]].append(
            _round_half_away(r["o_totalprice"] * 10000)
        )
    return by_g


def test_brown_forsythe_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_levene_brown_forsythe,
    )

    by_g = _scaled_prices_by_group(spark)
    # replicate the quantized algorithm exactly
    per = {}
    for g, vals in by_g.items():
        m2 = _interp_median2(vals)
        zs = [abs(2 * v - m2) for v in vals]
        per[g] = (len(zs), sum(zs), sum(z * z for z in zs))
    nn = sum(p[0] for p in per.values())
    szz = sum(p[1] for p in per.values())
    d = 20000.0
    ssb_s = ssw_s = 0
    for n_g, sz, qz in per.values():
        diff = sz / n_g / d - szz / nn / d
        ssb_s += _round_half_away(n_g * diff * diff * 10000.0)
        ssw_s += _round_half_away((qz - sz / n_g * sz) / (d * d))
    k = len(per)
    ssb, ssw = ssb_s / 10000.0, float(ssw_s)
    w_ref = (ssb / (k - 1)) / (ssw / (nn - k))

    got = agg_levene_brown_forsythe(spark, SF).collect()
    assert len(got) == 1
    row = got[0]
    assert row["n_orders"] == nn
    assert row["k_groups"] == k
    assert row["ss_between"] == _round4(ssb)
    assert row["ss_within"] == _round4(ssw)
    assert row["bf_w"] == _round6(w_ref)
    # sanity: W is a positive F-ratio of non-degenerate spreads
    assert row["bf_w"] > 0.0


def test_mood_median_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_mood_median_test,
    )

    by_g = _scaled_prices_by_group(spark)
    all_vals = [v for vals in by_g.values() for v in vals]
    m2 = _interp_median2(all_vals)
    cells = {
        g: (
            sum(1 for v in vals if 2 * v > m2),
            sum(1 for v in vals if 2 * v <= m2),
        )
        for g, vals in by_g.items()
    }
    n = sum(a + b for a, b in cells.values())
    c_ab = sum(a for a, _ in cells.values())
    c_le = sum(b for _, b in cells.values())
    t_s = 0
    for a, b in cells.values():
        r = a + b
        # quantization happens per GROUP ROW (both cells summed first),
        # matching the operator's one-row-per-group frame
        term = sum(
            (n * o - r * c) * (n * o - r * c) / (n * r * c)
            for o, c in ((a, c_ab), (b, c_le))
        )
        t_s += _round_half_away(term * 1e6)
    chi2 = _round6(t_s / 1e6)

    got = {r["priority"]: r for r in agg_mood_median_test(spark, SF).collect()}
    assert set(got) == set(cells)
    for g, (a, b) in cells.items():
        row = got[g]
        assert row["n_above"] == a
        assert row["n_below_eq"] == b
        assert row["share_above"] == _round6(a / (a + b))
        assert row["chi2"] == chi2
        assert row["df"] == len(cells) - 1
    # the dichotomy is at the interior median: both margins positive
    assert c_ab > 0 and c_le > 0


def test_grubbs_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_grubbs_outlier,
    )

    rows = (
        read_table(spark, SF, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    monthly = collections.defaultdict(int)
    for r in rows:
        mon = (r["o_orderdate"].year, r["o_orderdate"].month)
        monthly[mon] += _round_half_away(r["o_totalprice"] * 10000)
    n = len(monthly)
    s1 = sum(monthly.values())
    q2 = sum(v * v for v in monthly.values())
    best = min(monthly.items(), key=lambda kv: (-abs(n * kv[1] - s1), kv[0]))
    mean = s1 / n / 10000.0
    sd = math.sqrt((n * q2 - s1 * s1) / (n * (n - 1))) / 10000.0
    g_ref = (abs(n * best[1] - s1) / n / 10000.0) / sd

    got = agg_grubbs_outlier(spark, SF).collect()
    assert len(got) == 1
    row = got[0]
    assert row["n_months"] == n
    assert row["mean_revenue"] == _round4(mean)
    assert row["sd_revenue"] == _round4(sd)
    assert (row["suspect_month"].year, row["suspect_month"].month) == best[0]
    assert row["suspect_revenue"] == _round4(best[1] / 10000.0)
    assert row["g_stat"] == _round6(g_ref)
    # G is bounded by (n-1)/sqrt(n) for any sample (Shiffler 1988)
    assert 0.0 < row["g_stat"] <= (n - 1) / math.sqrt(n) + 1e-9


def test_simpson_diversity_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.text import (
        corpus_simpson_diversity,
    )

    docs = read_table(spark, SF, "documents").select("source", "text").collect()
    counts = collections.defaultdict(collections.Counter)
    for r in docs:
        counts[r["source"]].update(r["text"].split(" "))
    got = {r["source"]: r for r in corpus_simpson_diversity(spark, SF).collect()}
    expect_sources = {s for s, c in counts.items() if sum(c.values()) > 1}
    assert set(got) == expect_sources
    for s in expect_sources:
        c = counts[s]
        n = sum(c.values())
        sc2 = sum(v * v for v in c.values())
        scc1 = sum(v * (v - 1) for v in c.values())
        row = got[s]
        assert row["n_tokens"] == n
        assert row["vocab"] == len(c)
        lam = scc1 / (n * (n - 1.0))
        inv = n * n / sc2
        assert row["simpson_lambda"] == _round6(lam)
        assert row["gini_simpson"] == _round6(1.0 - lam)
        assert row["inv_simpson"] == _round6(inv)
        assert row["simpson_evenness"] == _round6(inv / len(c))
        # Hill-number ordering: effective types under squared weights
        # never exceed the raw vocabulary
        assert 1.0 <= row["inv_simpson"] <= len(c) + 1e-9
