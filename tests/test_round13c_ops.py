"""Independent-reference tests for the round-13 third batch: Welch's
t-test, one-way ANOVA, Kendall's tau-b and the Jarque-Bera normality
test — each replicated in pure python at sf0.001 (the same device as
test_round13_ops.py: the DuckDB oracle checks cross-engine parity;
these pin the SEMANTICS against a from-scratch implementation that
shares no code)."""

from __future__ import annotations

import collections
import math

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table

SF = "/root/testdata/sf0.001"


def _round_half_away(x: float) -> float:
    return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)


def test_welch_ttest_matches_scipy_style_reference(spark):
    """Pure-python Welch t and Welch-Satterthwaite df (the
    scipy.stats.ttest_ind(equal_var=False) formulas) on the scaled-int
    prices the operator quantizes to."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        MW_GROUP_A,
        MW_GROUP_B,
        agg_welch_ttest,
    )

    ga, gb = [], []
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        v = int(_round_half_away(r["o_totalprice"] * 10000))
        if r["o_orderpriority"] == MW_GROUP_A:
            ga.append(v)
        elif r["o_orderpriority"] == MW_GROUP_B:
            gb.append(v)
    n1, n2 = len(ga), len(gb)
    m1, m2 = sum(ga) / n1, sum(gb) / n2
    var1 = sum((x - m1) ** 2 for x in ga) / (n1 - 1)
    var2 = sum((x - m2) ** 2 for x in gb) / (n2 - 1)
    u1, u2 = var1 / n1, var2 / n2
    t = (m1 - m2) / math.sqrt(u1 + u2)
    df = (u1 + u2) ** 2 / (u1**2 / (n1 - 1) + u2**2 / (n2 - 1))

    rows = agg_welch_ttest(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_urgent"], r["n_low"]) == (n1, n2)
    assert abs(r["mean_urgent"] - m1 / 10000.0) < 1e-3
    assert abs(r["mean_diff"] - (m1 - m2) / 10000.0) < 1e-3
    assert abs(r["t_stat"] - t) < 1e-5
    assert abs(r["df_welch"] - df) < 1e-2


def test_oneway_anova_matches_pure_python(spark):
    """Textbook one-way F and eta-squared over all priorities; the
    operator's 0-dp quantization of the per-n SS terms (scaled-squared
    units, granularity 1e-8 money-squared) is far inside the assert
    tolerance."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_oneway_anova,
    )

    groups = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        groups[r["o_orderpriority"]].append(
            int(_round_half_away(r["o_totalprice"] * 10000))
        )
    allv = [v for g in groups.values() for v in g]
    n, k = len(allv), len(groups)
    grand = sum(allv) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups.values())
    ssw = sum(
        (v - sum(g) / len(g)) ** 2 for g in groups.values() for v in g
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    eta2 = ssb / (ssb + ssw)

    rows = agg_oneway_anova(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_orders"], r["k_groups"]) == (n, k)
    assert abs(r["f_stat"] - f) / max(f, 1e-9) < 1e-5
    assert abs(r["eta_squared"] - eta2) < 1e-5


def test_kendall_tau_matches_pure_python(spark):
    """O(n^2) concordance scan over the monthly (revenue, count) series
    with the tau-b tie correction (the scipy.stats.kendalltau
    variant='b' formulas)."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_kendall_tau,
    )

    rev, cnt = collections.defaultdict(int), collections.defaultdict(int)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    ):
        mon = (r["o_orderdate"].year, r["o_orderdate"].month)
        rev[mon] += int(_round_half_away(r["o_totalprice"] * 10000))
        cnt[mon] += 1
    mons = sorted(rev)
    xs = [rev[m] for m in mons]
    ys = [cnt[m] for m in mons]
    c = d = tx = ty = 0
    npairs = 0
    for i in range(len(mons)):
        for j in range(i + 1, len(mons)):
            npairs += 1
            dx, dy = xs[i] - xs[j], ys[i] - ys[j]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    tau = (c - d) / math.sqrt((npairs - tx) * (npairs - ty))

    rows = agg_kendall_tau(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_pairs"] == npairs
    assert (r["concordant"], r["discordant"]) == (c, d)
    assert abs(r["kendall_tau_b"] - tau) < 1e-6


def test_jarque_bera_matches_pure_python(spark):
    """Population-moment JB per ship year (the statsmodels jarque_bera
    formulas on population g1/g2), plus internal consistency with the
    descriptive skew/kurtosis twin."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.aggregates import (
        agg_jarque_bera,
        agg_skew_kurtosis,
    )

    by_year = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "lineitem")
        .select("l_shipdate", "l_quantity")
        .collect()
    ):
        by_year[r["l_shipdate"].year].append(
            int(_round_half_away(r["l_quantity"]))
        )
    want = {}
    for y, vals in by_year.items():
        n = len(vals)
        mean = sum(vals) / n
        m2 = sum((v - mean) ** 2 for v in vals) / n
        if m2 <= 0:
            continue
        m3 = sum((v - mean) ** 3 for v in vals) / n
        m4 = sum((v - mean) ** 4 for v in vals) / n
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3.0
        want[y] = (n, g1, g2, n * (g1**2 / 6.0 + g2**2 / 24.0))

    got = {r["year"]: r for r in agg_jarque_bera(spark, SF).collect()}
    assert set(got) == set(want)
    for y, (n, g1, g2, jb) in want.items():
        r = got[y]
        assert r["n_lines"] == n
        assert abs(r["skewness"] - g1) < 1e-5
        assert abs(r["kurtosis_excess"] - g2) < 1e-5
        assert abs(r["jb_stat"] - jb) < 1e-3

    # internal consistency: shares shape values with the descriptive twin
    desc = {r["year"]: r for r in agg_skew_kurtosis(spark, SF).collect()}
    for y in got:
        assert abs(got[y]["skewness"] - desc[y]["skewness"]) < 1e-9
        assert (
            abs(got[y]["kurtosis_excess"] - desc[y]["kurtosis_excess"])
            < 1e-9
        )


def _pure_centroid_scores(spark):
    """From-scratch nearest-centroid scored stream replicating the
    operator's quantization contract (1e-6 component means, 6-dp
    cosine)."""
    rows = (
        read_table(spark, SF, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    by_cls = collections.defaultdict(list)
    for r in rows:
        by_cls[r["label"]].append([float(v) for v in r["embedding"]])
    cents = {}
    for cls, vecs in by_cls.items():
        n = len(vecs)
        cents[cls] = [
            _round_half_away(
                sum(_round_half_away(v[d] * 1e6) for v in vecs)
                / (1e6 * n)
                * 1e6
            )
            / 1e6
            for d in range(len(vecs[0]))
        ]
    scored = []
    for r in rows:
        e = [float(v) for v in r["embedding"]]
        ne = math.sqrt(sum(x * x for x in e))
        for cls, c in cents.items():
            nc = math.sqrt(sum(x * x for x in c))
            cos = sum(a * b for a, b in zip(e, c)) / (ne * nc)
            scored.append(
                (r["vec_id"], r["label"], cls, _round_half_away(cos * 1e6) / 1e6)
            )
    return scored


def test_centroid_confusion_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.similarity import (
        sim_eval_centroid_confusion,
    )

    scored = _pure_centroid_scores(spark)
    best = {}
    for vid, true, cls, cos in scored:
        cur = best.get(vid)
        if cur is None or (-cos, cls) < (-cur[1], cur[0]):
            best[vid] = (cls, cos, true)
    n_true = collections.Counter(t for _, _, t in best.values())
    n_pred = collections.Counter(c for c, _, _ in best.values())
    tp = collections.Counter(
        t for c, _, t in best.values() if c == t
    )

    got = {r["label"]: r for r in sim_eval_centroid_confusion(spark, SF).collect()}
    assert set(got) == set(n_true)
    for cls in n_true:
        r = got[cls]
        assert r["n_true"] == n_true[cls]
        assert r["n_pred"] == n_pred.get(cls, 0)
        assert r["tp"] == tp.get(cls, 0)
        want_f1 = 2.0 * tp.get(cls, 0) / (n_true[cls] + n_pred.get(cls, 0))
        assert abs(r["f1"] - want_f1) < 1e-6
        if n_pred.get(cls, 0):
            assert abs(r["precision"] - tp.get(cls, 0) / n_pred[cls]) < 1e-6
        assert abs(r["recall"] - tp.get(cls, 0) / n_true[cls]) < 1e-6


def test_roc_auc_ovr_matches_pure_python(spark):
    """AUC via the direct pair-counting definition (ties count half) —
    an independent formulation of the operator's rank-sum identity."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.similarity import (
        sim_eval_roc_auc_ovr,
    )

    scored = _pure_centroid_scores(spark)
    by_cls = collections.defaultdict(lambda: ([], []))
    for _, true, cls, cos in scored:
        by_cls[cls][0 if true == cls else 1].append(cos)

    got = {r["label"]: r for r in sim_eval_roc_auc_ovr(spark, SF).collect()}
    for cls, (pos, neg) in by_cls.items():
        if not pos or not neg:
            assert cls not in got
            continue
        wins = ties = 0
        for p in pos:
            for q in neg:
                if p > q:
                    wins += 1
                elif p == q:
                    ties += 1
        auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
        r = got[cls]
        assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
        assert abs(r["auc"] - auc) < 1e-6


def test_cume_dist_deciles_matches_pure_python(spark):
    """Replicates ntile's positional bucketing and the cume_dist /
    percent_rank definitions from first principles per priority."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        window_cume_dist_deciles,
    )

    groups = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .collect()
    ):
        groups[r["o_orderpriority"]].append(
            (r["o_totalprice"], r["o_orderkey"])
        )
    want = {}
    for pri, rows in groups.items():
        rows.sort()
        n = len(rows)
        base, rem = divmod(n, 10)
        # ntile: first `rem` buckets get base+1 rows
        sizes = [base + (1 if i < rem else 0) for i in range(10)]
        # cume_dist / percent_rank per distinct value
        vals = [v for v, _ in rows]
        import bisect

        idx = 0
        for b, size in enumerate(sizes, start=1):
            bucket = rows[idx : idx + size]
            idx += size
            if not bucket:
                continue
            hi_v = bucket[-1][0]
            cd = bisect.bisect_right(vals, hi_v) / n
            # percent_rank of the LAST row's value: (rank-1)/(n-1)
            pr = bisect.bisect_left(vals, hi_v) / (n - 1)
            # bucket-max pr is the max over rows in bucket; rows sharing a
            # value share pr, and values increase within the bucket, so the
            # max is the last value's pr
            want[(pri, b)] = (
                size,
                bucket[0][0],
                hi_v,
                cd,
                pr,
            )

    got = {
        (r["priority"], r["decile"]): r
        for r in window_cume_dist_deciles(spark, SF).collect()
    }
    assert set(got) == set(want)
    for key, (size, lo, hi, cd, pr) in want.items():
        r = got[key]
        assert r["n_orders"] == size
        assert abs(r["lo_price"] - lo) < 1e-6
        assert abs(r["hi_price"] - hi) < 1e-6
        assert abs(r["cume_dist_hi"] - cd) < 1e-6
        assert abs(r["pct_rank_hi"] - pr) < 1e-6


def _pure_token_graph(spark):
    und = set()
    for r in read_table(spark, SF, "documents").select("text").collect():
        toks = r["text"].split(" ")
        for s, t in zip(toks, toks[1:]):
            if s != t:
                und.add((min(s, t), max(s, t)))
    nbrs = collections.defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    return und, nbrs


def test_clustering_coefficient_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.graph import (
        graph_clustering_coefficient,
    )

    und, nbrs = _pure_token_graph(spark)
    got = {r["token"]: r for r in graph_clustering_coefficient(spark, SF).collect()}
    want_tokens = {t for t, ns in nbrs.items() if len(ns) >= 2}
    assert set(got) == want_tokens
    for t in want_tokens:
        ns = sorted(nbrs[t])
        tri = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if (min(ns[i], ns[j]), max(ns[i], ns[j])) in und
        )
        d = len(ns)
        r = got[t]
        assert r["degree"] == d
        assert r["n_triangles"] == tri
        assert abs(r["clustering_coef"] - 2.0 * tri / (d * (d - 1))) < 1e-6


def test_jaccard_link_prediction_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.graph import (
        JC_TOP_K,
        RA_MAX_DEG,
        graph_link_prediction_jaccard,
    )

    und, nbrs = _pure_token_graph(spark)
    cn = collections.Counter()
    for z, ns in nbrs.items():
        if 2 <= len(ns) <= RA_MAX_DEG:
            ns = sorted(ns)
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    cn[(ns[i], ns[j])] += 1
    scored = []
    for (a, b), c in cn.items():
        if (a, b) in und:
            continue
        j = c / (len(nbrs[a]) + len(nbrs[b]) - c)
        key = _round_half_away(j * 1e12)
        scored.append((-key, a, b, c, j))
    scored.sort()
    want = scored[:JC_TOP_K]

    got = graph_link_prediction_jaccard(spark, SF).collect()
    assert len(got) == len(want)
    for g, (_, a, b, c, j) in zip(got, want):
        assert (g["token_a"], g["token_b"], g["common_neighbors"]) == (a, b, c)
        assert abs(g["jaccard"] - j) < 1e-6


def test_hapax_ratio_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.text import (
        text_hapax_ratio,
    )

    per = collections.defaultdict(collections.Counter)
    for r in read_table(spark, SF, "documents").select("source", "text").collect():
        per[r["source"]].update(r["text"].split(" "))

    got = {r["source"]: r for r in text_hapax_ratio(spark, SF).collect()}
    assert set(got) == set(per)
    for src, cnt in per.items():
        r = got[src]
        hapax = sum(1 for c in cnt.values() if c == 1)
        dis = sum(1 for c in cnt.values() if c == 2)
        assert r["n_tokens"] == sum(cnt.values())
        assert r["n_types"] == len(cnt)
        assert (r["hapax"], r["dis"]) == (hapax, dis)
        assert abs(r["hapax_type_ratio"] - hapax / len(cnt)) < 1e-6
        assert abs(r["hapax_token_share"] - hapax / sum(cnt.values())) < 1e-6


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_levenshtein_blocked_matches_pure_python(spark):
    """From-scratch blocking + Wagner-Fischer DP replication of the
    whole pipeline (block key, size cap, 20% integer-space threshold)."""
    import re

    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.dedup import (
        LEV_BLOCK_TOKS,
        LEV_MAX_BLOCK,
        LEV_REL_DEN,
        dedup_levenshtein_blocked,
    )

    base = {}
    for r in read_table(spark, SF, "documents").select("doc_id", "text").collect():
        nt = re.sub(r"\s+", " ", r["text"].strip().lower())
        base[r["doc_id"]] = nt
    blocks = collections.defaultdict(list)
    for did, nt in base.items():
        toks = nt.split(" ")
        blk = (
            len(toks) // LEV_BLOCK_TOKS,
            toks[0],
            toks[1] if len(toks) > 1 else "",
        )
        blocks[blk].append(did)
    want = []
    for ids in blocks.values():
        if not (2 <= len(ids) <= LEV_MAX_BLOCK):
            continue
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = base[ids[i]], base[ids[j]]
                led = _levenshtein(a, b)
                mx = max(len(a), len(b))
                if LEV_REL_DEN * led <= mx:
                    want.append(
                        (ids[i], ids[j], led, len(a), len(b), led / mx)
                    )
    want.sort()

    got = dedup_levenshtein_blocked(spark, SF).collect()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (
            g["doc_a"],
            g["doc_b"],
            g["lev_dist"],
            g["len_a"],
            g["len_b"],
        ) == w[:5]
        assert abs(g["rel_dist"] - w[5]) < 1e-6
    # the planted near-dups must actually be caught at this SF
    assert len(got) > 0


def test_ccf_matches_pure_python(spark):
    """Textbook cross-correlation on the aligned monthly series: the
    cleared-mean integer device must reproduce r_k computed the naive
    float way."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        CCF_MAX_LAG,
        CCF_X,
        CCF_Y,
        timeseries_ccf,
    )

    series = collections.defaultdict(dict)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_orderdate", "o_totalprice")
        .collect()
    ):
        if r["o_orderpriority"] in (CCF_X, CCF_Y):
            mon = (r["o_orderdate"].year, r["o_orderdate"].month)
            series[r["o_orderpriority"]][mon] = series[r["o_orderpriority"]].get(
                mon, 0
            ) + int(_round_half_away(r["o_totalprice"] * 10000))
    common = sorted(set(series[CCF_X]) & set(series[CCF_Y]))
    xs = [series[CCF_X][m] for m in common]
    ys = [series[CCF_Y][m] for m in common]
    n = len(common)
    mx, my = sum(xs) / n, sum(ys) / n
    dx = sum((v - mx) ** 2 for v in xs)
    dy = sum((v - my) ** 2 for v in ys)
    got = {r["lag_k"]: r for r in timeseries_ccf(spark, SF).collect()}
    assert set(got) == set(range(-CCF_MAX_LAG, CCF_MAX_LAG + 1))
    for k in got:
        num = sum(
            (xs[t] - mx) * (ys[t - k] - my)
            for t in range(n)
            if 0 <= t - k < n
        )
        r = got[k]
        assert r["n_overlap"] == n - abs(k)
        assert abs(r["ccf"] - num / math.sqrt(dx * dy)) < 1e-6


def test_ar2_yule_walker_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        timeseries_ar2_yule_walker,
    )

    got = {r["priority"]: r for r in timeseries_ar2_yule_walker(spark, SF).collect()}
    series = _monthly_scaled_c(spark)
    assert set(got) == set(series)
    for pri, by_mon in series.items():
        vals = [by_mon[m] for m in sorted(by_mon)]
        n = len(vals)
        mean = sum(vals) / n
        c0 = sum((v - mean) ** 2 for v in vals)
        r1 = sum(
            (vals[t] - mean) * (vals[t - 1] - mean) for t in range(1, n)
        ) / c0
        r2 = sum(
            (vals[t] - mean) * (vals[t - 2] - mean) for t in range(2, n)
        ) / c0
        # the operator quantizes r at 12 dp before the phi algebra
        r1q = _round_half_away(r1 * 1e12) / 1e12
        r2q = _round_half_away(r2 * 1e12) / 1e12
        phi1 = r1q * (1 - r2q) / (1 - r1q * r1q)
        phi2 = (r2q - r1q * r1q) / (1 - r1q * r1q)
        g = got[pri]
        assert g["n_months"] == n
        assert abs(g["r1"] - r1) < 1e-5
        assert abs(g["r2"] - r2) < 1e-5
        assert abs(g["phi1"] - phi1) < 1e-5
        assert abs(g["phi2"] - phi2) < 1e-5
        assert (
            abs(g["innovation_var_share"] - (1 - phi1 * r1q - phi2 * r2q))
            < 1e-5
        )


def _monthly_scaled_c(spark):
    series = collections.defaultdict(dict)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_orderdate", "o_totalprice")
        .collect()
    ):
        mon = (r["o_orderdate"].year, r["o_orderdate"].month)
        d = series[r["o_orderpriority"]]
        d[mon] = d.get(mon, 0) + int(_round_half_away(r["o_totalprice"] * 10000))
    return series


def test_user_path_trigrams_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        PATH_TOP_K,
        events_user_path_trigrams,
    )

    per_user = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    ):
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    cnt = collections.Counter()
    for rows in per_user.values():
        rows.sort()
        types = [t for _, _, t in rows]
        for i in range(len(types) - 2):
            cnt[tuple(types[i : i + 3])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOP_K]

    got = events_user_path_trigrams(spark, SF).collect()
    assert len(got) == len(want)
    for g, ((e1, e2, e3), n) in zip(got, want):
        assert (g["e1"], g["e2"], g["e3"], g["n_paths"]) == (e1, e2, e3, n)


def test_inter_arrival_stats_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        events_inter_arrival_stats,
    )

    per_type = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "events")
        .select("event_type", "ts", "event_id")
        .collect()
    ):
        us = int(r["ts"].timestamp() * 1e6) if r["ts"].tzinfo else None
        # naive wall read as UTC epoch — replicate timeparts semantics
        import calendar

        t = r["ts"]
        us = (
            calendar.timegm(t.timetuple()) * 1_000_000 + t.microsecond
        )
        per_type[r["event_type"]].append((us, r["event_id"]))

    def q_cont(sorted_vals, p):
        n = len(sorted_vals)
        pos = p * (n - 1)
        lo = int(math.floor(pos))
        hi = min(lo + 1, n - 1)
        frac = pos - lo
        return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac

    got = {r["event_type"]: r for r in events_inter_arrival_stats(spark, SF).collect()}
    assert set(got) == set(per_type)
    for et, rows in per_type.items():
        rows.sort()
        gaps = [b[0] - a[0] for a, b in zip(rows, rows[1:])]
        gaps_sorted = sorted(gaps)
        r = got[et]
        assert r["n_gaps"] == len(gaps)
        assert abs(r["mean_gap_s"] - sum(gaps) / len(gaps) / 1e6) < 1e-5
        assert abs(r["median_gap_s"] - q_cont(gaps_sorted, 0.5) / 1e6) < 1e-5
        assert abs(r["p90_gap_s"] - q_cont(gaps_sorted, 0.9) / 1e6) < 1e-5
        assert abs(r["max_gap_s"] - max(gaps) / 1e6) < 1e-6


def test_contingency_effect_sizes_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_contingency_effect_sizes,
    )

    cells = collections.Counter()
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .collect()
    ):
        cells[(r["o_orderstatus"], r["o_orderpriority"])] += 1
    n = sum(cells.values())
    rm = collections.Counter()
    cm = collections.Counter()
    for (s, p), o in cells.items():
        rm[s] += o
        cm[p] += o
    chi2 = sum(
        (o - rm[s] * cm[p] / n) ** 2 / (rm[s] * cm[p] / n)
        for (s, p), o in cells.items()
    )
    nr, nc = len(rm), len(cm)
    v = math.sqrt(chi2 / (n * (min(nr, nc) - 1)))
    c = math.sqrt(chi2 / (chi2 + n))
    t = math.sqrt(chi2 / (n * math.sqrt((nr - 1) * (nc - 1))))

    rows = agg_contingency_effect_sizes(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_orders"] == n
    assert r["df"] == (nr - 1) * (nc - 1)
    assert abs(r["chi2"] - chi2) < 1e-3
    assert abs(r["cramers_v"] - v) < 1e-5
    assert abs(r["contingency_c"] - c) < 1e-5
    assert abs(r["tschuprow_t"] - t) < 1e-5


def test_collocation_lift_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.text import (
        COLL_MIN_COUNT,
        COLL_TOP_K,
        text_collocation_lift,
    )

    uni = collections.Counter()
    big = collections.Counter()
    n_big = 0
    for r in read_table(spark, SF, "documents").select("text").collect():
        toks = r["text"].split(" ")
        uni.update(toks)
        for x, y in zip(toks, toks[1:]):
            big[(x, y)] += 1
            n_big += 1
    n_uni = sum(uni.values())
    scored = []
    for (x, y), c_xy in big.items():
        if c_xy < COLL_MIN_COUNT:
            continue
        lift = c_xy * n_uni * n_uni / (n_big * uni[x] * uni[y])
        scored.append((-_round_half_away(lift * 1e6), x, y, c_xy, lift))
    scored.sort()
    want = scored[:COLL_TOP_K]

    got = text_collocation_lift(spark, SF).collect()
    assert len(got) == len(want)
    for g, (_, x, y, c_xy, lift) in zip(got, want):
        assert (g["tok_x"], g["tok_y"], g["n_pair"]) == (x, y, c_xy)
        assert (g["n_x"], g["n_y"]) == (uni[x], uni[y])
        assert abs(g["lift"] - lift) < 1e-6


def test_gini_customer_revenue_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_gini_customer_revenue,
    )

    rev = collections.defaultdict(int)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        rev[r["o_custkey"]] += int(_round_half_away(r["o_totalprice"] * 10000))
    xs = [x for _, x in sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))]
    n = len(xs)
    sx = sum(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    gini = (2 * six - (n + 1) * sx) / (n * sx)
    top = sum(xs[n - n // 10 :])

    rows = agg_gini_customer_revenue(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_customers"] == n
    assert abs(r["total_revenue"] - sx / 10000.0) < 1e-2
    assert abs(r["gini"] - gini) < 1e-6
    assert abs(r["top_decile_share"] - top / sx) < 1e-6


def test_completeness_profile_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        _PROFILE_COLS,
        dq_completeness_profile,
    )

    rows = read_table(spark, SF, "orders").select(*_PROFILE_COLS).collect()
    got = {r["column_name"]: r for r in dq_completeness_profile(spark, SF).collect()}
    assert set(got) == set(_PROFILE_COLS)
    for c in _PROFILE_COLS:
        vals = [r[c] for r in rows]
        nn = sum(1 for v in vals if v is None)
        nd = len({v for v in vals if v is not None})
        r = got[c]
        assert r["n_rows"] == len(vals)
        assert (r["n_nulls"], r["n_distinct"]) == (nn, nd)
        assert abs(r["completeness"] - (len(vals) - nn) / len(vals)) < 1e-9


def test_dau_mau_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        events_dau_mau_stickiness,
    )

    monthly = collections.defaultdict(set)
    daily = collections.defaultdict(set)
    for r in read_table(spark, SF, "events").select("user_id", "ts").collect():
        t = r["ts"]
        monthly[(t.year, t.month)].add(r["user_id"])
        daily[(t.year, t.month, t.day)].add(r["user_id"])

    got = {
        (r["month"].year, r["month"].month): r
        for r in events_dau_mau_stickiness(spark, SF).collect()
    }
    assert set(got) == set(monthly)
    for (y, m), users in monthly.items():
        days = [d for d in daily if d[:2] == (y, m)]
        sum_dau = sum(len(daily[d]) for d in days)
        r = got[(y, m)]
        assert r["n_days"] == len(days)
        assert r["mau"] == len(users)
        assert abs(r["avg_dau"] - sum_dau / len(days)) < 1e-5
        assert abs(r["stickiness"] - sum_dau / (len(days) * len(users))) < 1e-6


def test_cohens_kappa_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.similarity import (
        sim_eval_cohens_kappa,
    )

    scored = _pure_centroid_scores(spark)
    best = {}
    for vid, true, cls, cos in scored:
        cur = best.get(vid)
        if cur is None or (-cos, cls) < (-cur[1], cur[0]):
            best[vid] = (cls, cos, true)
    n = len(best)
    tp = sum(1 for c, _, t in best.values() if c == t)
    rm = collections.Counter(t for _, _, t in best.values())
    cm = collections.Counter(c for c, _, _ in best.values())
    rc = sum(rm[l] * cm.get(l, 0) for l in rm | cm)
    kappa = (n * tp - rc) / (n * n - rc)

    rows = sim_eval_cohens_kappa(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_vectors"], r["n_agree"]) == (n, tp)
    assert abs(r["observed_agreement"] - tp / n) < 1e-6
    assert abs(r["expected_agreement"] - rc / (n * n)) < 1e-6
    assert abs(r["cohens_kappa"] - kappa) < 1e-6


def test_balanced_downsample_matches_pure_python(spark):
    import hashlib

    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.sampling import (
        sample_balanced_class_downsample,
    )

    by_label = collections.defaultdict(list)
    for r in read_table(spark, SF, "embeddings").select("vec_id", "label").collect():
        h = hashlib.md5(f"bal:{r['vec_id']}".encode()).hexdigest()
        by_label[r["label"]].append((h, r["vec_id"]))
    n_min = min(len(v) for v in by_label.values())
    want = []
    for lbl, rows in by_label.items():
        rows.sort()
        for rank, (_, vid) in enumerate(rows[:n_min], start=1):
            want.append((lbl, vid, rank))
    want.sort(key=lambda t: (t[0], t[1]))

    got = sample_balanced_class_downsample(spark, SF).collect()
    assert len(got) == len(want)
    # every class kept exactly n_min rows
    per = collections.Counter(g["label"] for g in got)
    assert set(per.values()) == {n_min}
    for g, (lbl, vid, rank) in zip(got, want):
        assert (g["label"], g["vec_id"], g["pick_rank"]) == (lbl, vid, rank)


def test_drawdown_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        window_drawdown,
    )

    got = {r["priority"]: r for r in window_drawdown(spark, SF).collect()}
    series = _monthly_scaled_c(spark)
    assert set(got) == set(series)
    for pri, by_mon in series.items():
        vals = [by_mon[m] for m in sorted(by_mon)]
        peak = 0
        mx = 0.0
        under = 0
        for v in vals:
            peak = max(peak, v)
            dd = (peak - v) / peak
            mx = max(mx, dd)
            if v < peak:
                under += 1
        r = got[pri]
        assert r["n_months"] == len(vals)
        assert abs(r["max_drawdown"] - mx) < 1e-6
        assert r["n_underwater"] == under


def test_hourly_profile_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        events_hourly_profile,
    )

    cnt = collections.Counter()
    tot = collections.Counter()
    for r in read_table(spark, SF, "events").select("event_type", "ts").collect():
        cnt[(r["event_type"], r["ts"].hour)] += 1
        tot[r["event_type"]] += 1

    got = {
        (r["event_type"], r["hour_of_day"]): r
        for r in events_hourly_profile(spark, SF).collect()
    }
    assert set(got) == set(cnt)
    for key, n in cnt.items():
        r = got[key]
        assert r["n_events"] == n
        assert abs(r["share_of_type"] - n / tot[key[0]]) < 1e-6


def test_pacf_matches_durbin_levinson(spark):
    """Independent check: the closed Cramer forms must agree with the
    standard Durbin-Levinson recursion run on the same quantized ACF."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        PACF_SCALE,
        timeseries_pacf,
    )

    got = collections.defaultdict(dict)
    for r in timeseries_pacf(spark, SF).collect():
        got[r["priority"]][r["lag_k"]] = r["pacf"]
    series = _monthly_scaled_c(spark)
    assert set(got) == set(series)
    for pri, by_mon in series.items():
        vals = [by_mon[m] for m in sorted(by_mon)]
        n = len(vals)
        mean = sum(vals) / n
        c0 = sum((v - mean) ** 2 for v in vals)
        r = [1.0]
        for k in (1, 2, 3):
            rk = (
                sum(
                    (vals[t] - mean) * (vals[t - k] - mean)
                    for t in range(k, n)
                )
                / c0
            )
            r.append(_round_half_away(rk * PACF_SCALE) / PACF_SCALE)
        # Durbin-Levinson
        phi = {1: {1: r[1]}}
        v = 1 - r[1] ** 2
        pacf = {1: r[1]}
        for k in (2, 3):
            num = r[k] - sum(phi[k - 1][j] * r[k - j] for j in range(1, k))
            phi_kk = num / v
            phi[k] = {k: phi_kk}
            for j in range(1, k):
                phi[k][j] = phi[k - 1][j] - phi_kk * phi[k - 1][k - j]
            v = v * (1 - phi_kk**2)
            pacf[k] = phi_kk
        for k in (1, 2, 3):
            assert abs(got[pri][k] - pacf[k]) < 2e-5, (pri, k)


def test_two_proportion_ztest_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        MW_GROUP_A,
        MW_GROUP_B,
        agg_two_proportion_ztest,
    )

    n1 = n2 = x1 = x2 = 0
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_orderstatus")
        .collect()
    ):
        if r["o_orderpriority"] == MW_GROUP_A:
            n1 += 1
            x1 += r["o_orderstatus"] == "F"
        elif r["o_orderpriority"] == MW_GROUP_B:
            n2 += 1
            x2 += r["o_orderstatus"] == "F"
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))

    rows = agg_two_proportion_ztest(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_urgent"], r["n_low"], r["x_urgent"], r["x_low"]) == (
        n1,
        n2,
        x1,
        x2,
    )
    assert abs(r["rate_urgent"] - p1) < 1e-6
    assert abs(r["z_score"] - z) < 1e-5


def test_pareto_8020_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        events_pareto_8020,
    )

    cnt = collections.Counter()
    for r in read_table(spark, SF, "events").select("user_id").collect():
        cnt[r["user_id"]] += 1
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    cum = 0
    k = None
    cum_k = None
    for i, (_, c) in enumerate(order, start=1):
        cum += c
        if 5 * cum >= 4 * total:
            k, cum_k = i, cum
            break

    rows = events_pareto_8020(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_users"] == len(cnt)
    assert r["total_events"] == total
    assert r["k_users_80"] == k
    assert abs(r["user_share"] - k / len(cnt)) < 1e-6
    assert abs(r["event_share"] - cum_k / total) < 1e-6


def test_dedup_rate_by_source_matches_pure_python(spark):
    import re

    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.dedup import (
        dedup_rate_by_source,
    )

    groups = collections.defaultdict(collections.Counter)
    for r in read_table(spark, SF, "documents").select("source", "text").collect():
        nt = re.sub(r"\s+", " ", r["text"].strip().lower())
        groups[r["source"]][nt] += 1

    got = {r["source"]: r for r in dedup_rate_by_source(spark, SF).collect()}
    assert set(got) == set(groups)
    for src, cnt in groups.items():
        n = sum(cnt.values())
        u = len(cnt)
        r = got[src]
        assert (r["n_docs"], r["n_unique"], r["n_dup_rows"]) == (n, u, n - u)
        assert abs(r["dup_rate"] - (n - u) / n) < 1e-6


def test_scd2_history_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.olap import (
        scd2_customer_priority_history,
    )

    per = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
        .collect()
    ):
        per[r["o_custkey"]].append(
            (r["o_orderdate"], r["o_orderkey"], r["o_orderpriority"])
        )
    want = {}
    for ck, rows in per.items():
        rows.sort()
        runs = []
        for dt, _, pri in rows:
            if not runs or runs[-1][0] != pri:
                runs.append([pri, dt, 0])
            runs[-1][2] += 1
        for v, (pri, start, n) in enumerate(runs, start=1):
            nxt = runs[v][1] if v < len(runs) else None
            want[(ck, v)] = (pri, start, nxt, n, 1 if nxt is None else 0)

    got = {
        (r["custkey"], r["version"]): r
        for r in scd2_customer_priority_history(spark, SF).collect()
    }
    assert set(got) == set(want)
    for key, (pri, start, nxt, n, cur) in want.items():
        r = got[key]
        assert r["priority"] == pri
        assert r["valid_from"] == start
        assert r["n_orders"] == n
        assert r["is_current"] == cur
        if nxt is not None:
            assert r["valid_to"] == nxt
        else:
            assert r["valid_to"].year == 2099
    # intervals tile: every non-current row's valid_to == next valid_from
    # (already checked via nxt), and exactly one current row per customer
    cur_counts = collections.Counter(k[0] for k, v in want.items() if v[4])
    assert set(cur_counts.values()) == {1}


def test_ses_grid_search_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.custom_udf import (
        SES_ALPHAS,
        timeseries_ses_grid_search,
    )

    series = _monthly_scaled_c(spark)
    got = collections.defaultdict(dict)
    for r in timeseries_ses_grid_search(spark, SF).collect():
        got[r["priority"]][r["alpha"]] = r
    assert set(got) == set(series)
    for pri, by_mon in series.items():
        vals = [by_mon[m] / 10000.0 for m in sorted(by_mon)]
        # match the operator's 4dp-rounded monthly input
        vals = [_round_half_away(v * 10000.0) / 10000.0 for v in vals]
        fits = {}
        for a in SES_ALPHAS:
            s = None
            sse = 0.0
            for x in vals:
                if s is None:
                    s = x
                else:
                    e = x - s
                    sse += e * e
                    s = a * x + (1.0 - a) * s
            fits[a] = sse
        best = min(fits, key=lambda a: (fits[a], a))
        n = len(vals)
        assert set(got[pri]) == set(SES_ALPHAS)
        for a in SES_ALPHAS:
            r = got[pri][a]
            assert abs(r["rmse"] - math.sqrt(fits[a] / (n - 1))) < 1e-3
            assert r["is_best"] == (1 if a == best else 0)
        assert sum(r["is_best"] for r in got[pri].values()) == 1


def test_margin_reliability_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.similarity import (
        MARGIN_BIN,
        MARGIN_NBINS,
        sim_eval_margin_reliability,
    )

    scored = _pure_centroid_scores(spark)
    per_vec = collections.defaultdict(list)
    for vid, true, cls, cos in scored:
        per_vec[(vid, true)].append((-cos, cls))
    bins = collections.defaultdict(lambda: [0, 0, 0])  # n, correct, sum_m
    for (vid, true), rows in per_vec.items():
        rows.sort()
        c1 = int(_round_half_away(-rows[0][0] * 1e6))
        c2 = int(_round_half_away(-rows[1][0] * 1e6))
        pred = rows[0][1]
        m = c1 - c2
        b = min(m // MARGIN_BIN, MARGIN_NBINS - 1)
        bins[b][0] += 1
        bins[b][1] += pred == true
        bins[b][2] += m

    got = {r["margin_bin"]: r for r in sim_eval_margin_reliability(spark, SF).collect()}
    assert set(got) == set(bins)
    for b, (n, ok, sm) in bins.items():
        r = got[b]
        assert (r["n_vectors"], r["n_correct"]) == (n, ok)
        assert abs(r["accuracy"] - ok / n) < 1e-6
        assert abs(r["avg_margin"] - sm / n / 1e6) < 1e-6
