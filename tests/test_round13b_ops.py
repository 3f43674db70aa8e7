"""Independent-reference tests for the round-13 second batch:
gaps-and-islands streaks, the exact-integer DFT periodogram, retrieval
MRR/recall eval, and the fixed-round k-core peel — each replicated in
pure python at sf0.001 (the same device as test_round13_ops.py: the
DuckDB oracle checks cross-engine parity; these pin the SEMANTICS
against a from-scratch implementation that shares no code)."""

from __future__ import annotations

import collections
import math

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table

SF = "/root/testdata/sf0.001"


def _round_half_away(x: float) -> float:
    return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)


def _monthly_scaled(spark, keyed=True):
    series = collections.defaultdict(dict)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_orderdate", "o_totalprice")
        .collect()
    ):
        mon = (r["o_orderdate"].year, r["o_orderdate"].month)
        key = r["o_orderpriority"] if keyed else ""
        series[key][mon] = series[key].get(mon, 0) + int(
            _round_half_away(r["o_totalprice"] * 10000)
        )
    return series


def test_gaps_islands_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        STREAK_MIN,
        window_gaps_islands,
    )

    want = []
    for key, by_mon in sorted(_monthly_scaled(spark).items()):
        mons = sorted(by_mon)
        runs = []
        for prev, cur in zip(mons, mons[1:]):
            if by_mon[cur] > by_mon[prev]:
                gain = by_mon[cur] - by_mon[prev]
                if runs and runs[-1][-1][0] == prev:
                    runs[-1].append((cur, gain))
                else:
                    runs.append([(cur, gain)])
        for run in runs:
            if len(run) >= STREAK_MIN:
                want.append(
                    (
                        key,
                        run[0][0],
                        run[-1][0],
                        len(run),
                        sum(g for _, g in run) / 10000.0,
                    )
                )

    rows = window_gaps_islands(spark, SF).collect()
    got = [
        (
            r["priority"],
            (r["streak_start"].year, r["streak_start"].month),
            (r["streak_end"].year, r["streak_end"].month),
            r["months_up"],
            r["total_gain"],
        )
        for r in rows
    ]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4]
        assert abs(g[4] - w[4]) < 1e-6


def test_periodogram_matches_pure_python(spark):
    """The exact-integer DFT must agree with the plain float harmonic
    regression to well past rounding — the integer path exists for
    cross-engine determinism, not to change the statistic. The scaled
    basis introduces a relative basis error of ~5e-7 (866025 vs
    sqrt(3)/2*1e6), so compare at 1e-4."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        PGRAM_BASIS,
        timeseries_periodogram,
    )

    by_mon = _monthly_scaled(spark, keyed=False)[""]
    ys = [by_mon[m] / 10000.0 for m in sorted(by_mon)]
    n = len(ys)
    mean = sum(ys) / n
    yc = [y - mean for y in ys]
    m2 = sum(v * v for v in yc)
    want = {}
    for p, _, _ in PGRAM_BASIS:
        a = sum(
            v * math.cos(2 * math.pi * t / p) for t, v in enumerate(yc)
        )
        b = sum(
            v * math.sin(2 * math.pi * t / p) for t, v in enumerate(yc)
        )
        amp = 2.0 * math.sqrt(a * a + b * b) / n
        share = 2.0 * (a * a + b * b) / (n * m2)
        want[p] = (amp, share)

    rows = timeseries_periodogram(spark, SF).collect()
    assert [r["period"] for r in rows] == [p for p, _, _ in PGRAM_BASIS]
    for r in rows:
        amp, share = want[r["period"]]
        assert r["n_months"] == n
        assert abs(r["amp"] - amp) / max(amp, 1.0) < 1e-4
        assert abs(r["var_share"] - share) < 1e-4
        assert 0.0 <= r["var_share"] <= 1.0 + 1e-9


def _dround6(x: float) -> float:
    return _round_half_away(x * 1e6) / 1e6


def test_sim_eval_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.similarity import (
        EVAL_K,
        N_QUERIES,
        sim_eval_mrr_recall,
    )

    emb = {
        r["vec_id"]: (list(r["embedding"]), r["label"])
        for r in read_table(spark, SF, "embeddings").collect()
    }

    def cos(u, v):
        du = [float(x) for x in u]
        dv = [float(x) for x in v]
        dp = sum(a * b for a, b in zip(du, dv))
        return dp / (
            math.sqrt(sum(a * a for a in du))
            * math.sqrt(sum(b * b for b in dv))
        )

    corpus = {i: e for i, e in emb.items() if i >= N_QUERIES}
    label_tot = collections.Counter(lab for _, lab in corpus.values())
    want = {}
    for qid in range(N_QUERIES):
        qe, ql = emb[qid]
        ranked = sorted(
            ((_dround6(cos(qe, ce)), nid, lab) for nid, (ce, lab) in corpus.items()),
            key=lambda t: (-t[0], t[1]),
        )[:EVAL_K]
        rel_ranks = [
            i + 1 for i, (_, _, lab) in enumerate(ranked) if lab == ql
        ]
        first = rel_ranks[0] if rel_ranks else 0
        want[qid] = (
            ql,
            len(rel_ranks),
            first,
            _dround6(1.0 / first) if first else 0.0,
            label_tot[ql],
            _dround6(len(rel_ranks) / label_tot[ql]),
        )

    rows = sim_eval_mrr_recall(spark, SF).collect()
    assert len(rows) == len(want)
    for r in rows:
        ql, hits, first, rr, tot, rec = want[r["query_id"]]
        assert r["label"] == ql
        assert r["hits_at_k"] == hits
        assert r["first_rel_rank"] == first
        assert abs(r["reciprocal_rank"] - rr) < 1e-9
        assert r["n_rel_total"] == tot
        assert abs(r["recall_at_k"] - rec) < 1e-9


def test_kcore_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.graph import (
        CC_MIN_SUPPORT,
        KCORE_K,
        KCORE_ROUNDS,
        graph_kcore_peel,
    )

    # the edge relation counts LINE pairs (the raw self-join on the order
    # key): a part appearing on two lines of one order contributes twice
    # to each of its pairs — replicate with per-order multiplicity
    baskets = collections.defaultdict(collections.Counter)
    for r in (
        read_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        baskets[r["l_orderkey"]][r["l_partkey"]] += 1
    sup = collections.Counter()
    for cnt in baskets.values():
        ps = sorted(cnt)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                sup[(ps[i], ps[j])] += cnt[ps[i]] * cnt[ps[j]]
    edges = {e for e, s in sup.items() if s >= CC_MIN_SUPPORT}
    for _ in range(KCORE_ROUNDS):
        deg = collections.Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v, d in deg.items() if d >= KCORE_K}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1

    rows = graph_kcore_peel(spark, SF).collect()
    got = {r["part"]: r["deg"] for r in rows}
    assert got == dict(deg)
    assert [r["part"] for r in rows] == sorted(got)


def test_skew_kurtosis_matches_pure_python(spark):
    """The exact-integer moment combination must equal the plain float
    population formula (the integer path exists for determinism)."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.aggregates import (
        agg_skew_kurtosis,
    )

    by_year = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "lineitem")
        .select("l_shipdate", "l_quantity")
        .collect()
    ):
        by_year[r["l_shipdate"].year].append(int(round(r["l_quantity"])))
    want = {}
    for year, qs in by_year.items():
        n = len(qs)
        mean = sum(qs) / n
        m2 = sum((q - mean) ** 2 for q in qs) / n
        m3 = sum((q - mean) ** 3 for q in qs) / n
        m4 = sum((q - mean) ** 4 for q in qs) / n
        if m2 <= 0:
            continue
        want[year] = (
            n,
            mean,
            math.sqrt(m2),
            m3 / m2**1.5,
            m4 / m2**2 - 3.0,
        )

    rows = agg_skew_kurtosis(spark, SF).collect()
    assert sorted(r["year"] for r in rows) == sorted(want)
    for r in rows:
        n, mean, sd, g1, g2 = want[r["year"]]
        assert r["n_lines"] == n
        assert abs(r["mean_qty"] - mean) < 1e-5
        assert abs(r["sd_qty"] - sd) < 1e-5
        assert abs(r["skewness"] - g1) < 1e-5
        assert abs(r["kurtosis_excess"] - g2) < 1e-5


def test_neyman_allocation_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.sampling import (
        NEYMAN_BUDGET,
        sample_neyman_allocation,
    )

    by_src = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "documents")
        .select("source", "n_chars")
        .collect()
    ):
        by_src[r["source"]].append(r["n_chars"])
    w_int = {}
    stats = {}
    for src, ys in by_src.items():
        n = len(ys)
        mean = sum(ys) / n
        var = sum((y - mean) ** 2 for y in ys) / n
        sd = math.sqrt(var)
        stats[src] = (n, mean, sd)
        w_int[src] = int(_round_half_away(n * sd * 10000.0))
    w_tot = sum(w_int.values())

    rows = sample_neyman_allocation(spark, SF).collect()
    assert sorted(r["stratum"] for r in rows) == sorted(by_src)
    alloc_total = 0
    for r in rows:
        n, mean, sd = stats[r["stratum"]]
        assert r["n_docs"] == n
        assert abs(r["mean_chars"] - mean) < 1e-3
        assert abs(r["sd_chars"] - sd) < 1e-3
        share = w_int[r["stratum"]] / w_tot
        assert abs(r["alloc_share"] - share) < 1e-5
        assert r["n_alloc"] == math.floor(
            NEYMAN_BUDGET * w_int[r["stratum"]] / w_tot
        )
        alloc_total += r["n_alloc"]
    # floor allocation never exceeds the budget
    assert alloc_total <= NEYMAN_BUDGET


def test_share_of_total_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        window_share_of_total,
    )

    per = collections.defaultdict(int)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderdate", "o_orderpriority", "o_totalprice")
        .collect()
    ):
        per[(r["o_orderdate"].year, r["o_orderpriority"])] += int(
            _round_half_away(r["o_totalprice"] * 10000)
        )
    year_tot = collections.defaultdict(int)
    for (y, _), v in per.items():
        year_tot[y] += v

    rows = window_share_of_total(spark, SF).collect()
    assert len(rows) == len(per)
    for r in rows:
        key = (r["year"], r["priority"])
        assert abs(r["revenue"] - per[key] / 10000.0) < 1e-6
        assert abs(r["share_of_year"] - per[key] / year_tot[r["year"]]) < 1e-5
    # shares sum to ~1 per year and ranks are a permutation
    by_year = collections.defaultdict(list)
    for r in rows:
        by_year[r["year"]].append(r)
    for y, rs in by_year.items():
        assert abs(sum(r["share_of_year"] for r in rs) - 1.0) < 1e-4
        assert sorted(r["rank_in_year"] for r in rs) == list(
            range(1, len(rs) + 1)
        )


def test_gini_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.text import (
        corpus_gini_by_source,
    )

    counts = collections.defaultdict(collections.Counter)
    for r in (
        read_table(spark, SF, "documents").select("source", "text").collect()
    ):
        counts[r["source"]].update(r["text"].split(" "))
    want = {}
    for src, cnt in counts.items():
        cs = sorted(cnt.values())
        k, n = len(cs), sum(cs)
        s_ic = sum((i + 1) * c for i, c in enumerate(cs))
        want[src] = (
            n,
            k,
            (2 * s_ic - (k + 1) * n) / (k * n),
            max(cs) / n,
        )

    rows = corpus_gini_by_source(spark, SF).collect()
    assert sorted(r["source"] for r in rows) == sorted(want)
    for r in rows:
        n, k, gini, bp = want[r["source"]]
        assert r["n_tokens"] == n and r["vocab"] == k
        assert abs(r["gini"] - gini) < 1e-6
        assert abs(r["berger_parker"] - bp) < 1e-6
        assert 0.0 <= r["gini"] < 1.0


def test_runs_test_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        timeseries_runs_test,
    )

    want = {}
    for key, by_mon in _monthly_scaled(spark).items():
        ys = [by_mon[m] for m in sorted(by_mon)]
        signs = [
            1 if b > a else -1
            for a, b in zip(ys, ys[1:])
            if b != a
        ]
        n1 = sum(1 for s in signs if s > 0)
        n2 = sum(1 for s in signs if s < 0)
        n = n1 + n2
        if n1 == 0 or n2 == 0 or n <= 2:
            continue
        r_runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        mu = 1.0 + 2.0 * n1 * n2 / n
        var = (2 * n1 * n2) * (2 * n1 * n2 - n) / (n * n * (n - 1.0))
        if var <= 0:
            continue
        want[key] = (n, n1, n2, r_runs, mu, (r_runs - mu) / math.sqrt(var))

    rows = timeseries_runs_test(spark, SF).collect()
    assert sorted(r["priority"] for r in rows) == sorted(want)
    for r in rows:
        n, n1, n2, rr, mu, z = want[r["priority"]]
        assert (r["n_moves"], r["n_up"], r["n_down"], r["runs"]) == (
            n,
            n1,
            n2,
            rr,
        )
        assert abs(r["expected_runs"] - mu) < 1e-6
        assert abs(r["z_score"] - z) < 1e-6


def test_ljung_box_matches_pure_python(spark):
    """Q must match the plain float Ljung-Box over the same monthly
    series (quantization error of the 1e12-scaled terms is far below
    the comparison tolerance)."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        ACF_MAX_LAG,
        timeseries_ljung_box,
    )

    want = {}
    for key, by_mon in _monthly_scaled(spark).items():
        ys = [by_mon[m] for m in sorted(by_mon)]
        n = len(ys)
        mean = sum(ys) / n
        den = sum((y - mean) ** 2 for y in ys)
        q = 0.0
        df = 0
        for k in range(1, ACF_MAX_LAG + 1):
            if k >= n:
                break
            num = sum(
                (ys[t] - mean) * (ys[t - k] - mean) for t in range(k, n)
            )
            rho = num / den
            q += rho * rho / (n - k)
            df += 1
        want[key] = (n, df, n * (n + 2) * q)

    rows = timeseries_ljung_box(spark, SF).collect()
    assert sorted(r["priority"] for r in rows) == sorted(want)
    for r in rows:
        n, df, q = want[r["priority"]]
        assert (r["n_months"], r["df"]) == (n, df)
        assert abs(r["q_stat"] - q) < 1e-3
        assert r["q_stat"] >= 0.0


def test_pca_power_iteration_matches_pure_python(spark):
    """Replicates the exact quantized algorithm step for step in pure
    python (same IEEE double ops, same fold order, same ties-away
    quantizations) — got must equal want to rounding — and then checks
    the MEANING: the returned direction's Rayleigh quotient must be
    within a few percent of the true top eigenvalue computed by a
    long-converged float power iteration."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.similarity import (
        EMB_DIM,
        PCA_CS,
        PCA_ITERS,
        PCA_QS,
        embedding_pca_power_iteration,
    )

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in read_table(spark, SF, "embeddings").collect()
    }
    n = len(vecs)
    xs = {
        i: [_round_half_away(x * PCA_CS) for x in v]
        for i, v in vecs.items()
    }
    s1 = [sum(xs[i][k] for i in xs) for k in range(EMB_DIM)]
    ct = {
        i: [(n * xs[i][k] - s1[k]) / (n * PCA_CS) for k in range(EMB_DIM)]
        for i in xs
    }

    def dot_seq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    tv_s = sum(
        int(_round_half_away(dot_seq(ct[i], ct[i]) / n * PCA_QS))
        for i in ct
    )
    v = [0.125] * EMB_DIM
    lam = None
    for _ in range(PCA_ITERS):
        ds = {
            i: int(_round_half_away(dot_seq(ct[i], v) * PCA_QS))
            for i in ct
        }
        ws = []
        for k in range(EMB_DIM):
            ws.append(
                sum(
                    int(
                        _round_half_away(
                            (ct[i][k] * (ds[i] / PCA_QS)) * PCA_QS
                        )
                    )
                    for i in ct
                )
            )
        w = [x / PCA_QS for x in ws]
        nrm = math.sqrt(dot_seq(w, w))
        v = [_dround6(x / nrm) for x in w]
        lam = _dround6(nrm)
    share = _dround6(lam / (tv_s / PCA_QS))

    rows = embedding_pca_power_iteration(spark, SF).collect()
    assert [r["k"] for r in rows] == list(range(1, EMB_DIM + 1))
    for r in rows:
        assert abs(r["loading"] - v[r["k"] - 1]) < 1e-9
        assert abs(r["lambda1"] - lam) < 1e-9
        assert abs(r["var_share"] - share) < 1e-9
    # unit norm (to quantization)
    assert abs(sum(x * x for x in v) - 1.0) < 1e-3

    # meaning: converge a float power iteration for 200 steps and
    # compare Rayleigh quotients. The synthetic embeddings are close to
    # isotropic (small eigengap), so the fixed 6-step result captures
    # ~88% of the top eigendirection's energy — bound at 0.85
    u = [1.0 / math.sqrt(EMB_DIM)] * EMB_DIM
    for _ in range(200):
        w2 = [
            sum(ct[i][k] * dot_seq(ct[i], u) for i in ct)
            for k in range(EMB_DIM)
        ]
        nz = math.sqrt(dot_seq(w2, w2))
        u = [x / nz for x in w2]
    lam_true = sum(dot_seq(ct[i], u) ** 2 for i in ct)
    # rayleigh of the operator's v (per-sample covariance uses 1/1 —
    # both lam and lam_true are in the same unnormalized units)
    lam_v = sum(dot_seq(ct[i], v) ** 2 for i in ct)
    assert lam_v >= 0.85 * lam_true


def test_cluster_purity_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.similarity import (
        IVF_K,
        N_QUERIES,
        sim_eval_cluster_purity,
    )

    emb = {
        r["vec_id"]: (list(r["embedding"]), r["label"])
        for r in read_table(spark, SF, "embeddings").collect()
    }

    def cos(u, v):
        du = [float(x) for x in u]
        dv = [float(x) for x in v]
        dp = sum(a * b for a, b in zip(du, dv))
        return dp / (
            math.sqrt(sum(a * a for a in du))
            * math.sqrt(sum(b * b for b in dv))
        )

    cents = {
        i: e for i, (e, _) in emb.items()
        if N_QUERIES <= i < N_QUERIES + IVF_K
    }
    clusters = collections.defaultdict(list)
    for i, (e, lab) in emb.items():
        if i < N_QUERIES:
            continue
        best = min(
            ((-_dround6(cos(e, ce)), cid) for cid, ce in cents.items())
        )[1]
        clusters[best].append(lab)
    per = {}
    maj_tot = n_tot = 0
    for cid, labs in clusters.items():
        cnt = collections.Counter(labs)
        maj_lab, maj_c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0])
        )
        per[cid] = (len(labs), maj_lab, maj_c)
        maj_tot += maj_c
        n_tot += len(labs)

    rows = sim_eval_cluster_purity(spark, SF).collect()
    assert sorted(r["cluster_id"] for r in rows) == sorted(per)
    for r in rows:
        size, maj_lab, maj_c = per[r["cluster_id"]]
        assert (r["size"], r["majority_label"], r["majority_count"]) == (
            size,
            maj_lab,
            maj_c,
        )
        assert abs(r["cluster_purity"] - maj_c / size) < 1e-5
        assert abs(r["overall_purity"] - maj_tot / n_tot) < 1e-5


def test_survival_km_matches_pure_python(spark):
    """Replicates KM with the CLASSIC running product (not the engine's
    ln/exp device) — agreement to ~1e-6 proves the quantized-log
    formulation computes the textbook estimator."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        events_survival_km,
    )

    US_DAY = 86_400_000_000
    clicks = collections.defaultdict(list)
    purchases = collections.defaultdict(list)
    tmax = None
    for r in (
        read_table(spark, SF, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    ):
        # epoch-micros from wall parts (tz-proof, mirrors
        # epoch_micros_from_ntz)
        import datetime

        us = int(
            (r["ts"] - datetime.datetime(1970, 1, 1)).total_seconds()
            * 1_000_000
        )
        tmax = us if tmax is None else max(tmax, us)
        if r["event_type"] == "click":
            clicks[r["user_id"]].append(us)
        elif r["event_type"] == "purchase":
            purchases[r["user_id"]].append(us)
    durs = []
    for u, cs in clicks.items():
        t0 = min(cs)
        tps = [t for t in purchases.get(u, []) if t >= t0]
        if tps:
            durs.append(((min(tps) - t0) // US_DAY, 1))
        else:
            durs.append(((tmax - t0) // US_DAY, 0))
    perd = collections.defaultdict(lambda: [0, 0])  # dur -> [d_i, m_i]
    for d, e in durs:
        perd[d][0] += e
        perd[d][1] += 1
    want = []
    s = 1.0
    n_at_risk = len(durs)
    for d in sorted(perd):
        d_i, m_i = perd[d]
        if d_i > 0:
            s *= (n_at_risk - d_i) / n_at_risk
            want.append((d, n_at_risk, d_i, s))
        n_at_risk -= m_i

    rows = events_survival_km(spark, SF).collect()
    got = [
        (r["duration_days"], r["n_risk"], r["d_events"], r["survival"])
        for r in rows
    ]
    assert len(got) == len(want)
    prev = 1.0
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert abs(g[3] - w[3]) < 1e-6
        assert g[3] <= prev + 1e-9  # survival is non-increasing
        prev = g[3]


def test_mann_whitney_matches_scipy_style_reference(spark):
    """Pure-python rank-sum replication with average ranks and the
    tie-corrected normal approximation (the scipy.stats.mannwhitneyu
    method='asymptotic' formulas)."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        MW_GROUP_A,
        MW_GROUP_B,
        agg_mann_whitney_u,
    )

    vals = []
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        if r["o_orderpriority"] in (MW_GROUP_A, MW_GROUP_B):
            vals.append(
                (
                    r["o_orderpriority"] == MW_GROUP_A,
                    int(_round_half_away(r["o_totalprice"] * 10000)),
                )
            )
    vals.sort(key=lambda t: t[1])
    # average ranks with ties
    ranks = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j][1] == vals[i][1]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        ranks[vals[i][1]] = avg
        i = j
    r1 = sum(ranks[v] for is_a, v in vals if is_a)
    n1 = sum(1 for is_a, _ in vals if is_a)
    n2 = len(vals) - n1
    n = n1 + n2
    u1 = r1 - n1 * (n1 + 1) / 2.0
    cnt = collections.Counter(v for _, v in vals)
    t3t = sum(t**3 - t for t in cnt.values())
    var = n1 * n2 / 12.0 * ((n + 1) - t3t / (n * (n - 1.0)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)

    rows = agg_mann_whitney_u(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_urgent"], r["n_low"]) == (n1, n2)
    assert abs(r["u_stat"] - u1) < 1e-6
    assert abs(r["z_score"] - z) < 1e-6


def test_minhash_lsh_eval_matches_pure_python(spark):
    """Replicates the whole portable pipeline — md5 minhash signatures,
    banding, bucket collision, exact-Jaccard truth — with hashlib."""
    import hashlib

    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.dedup import (
        EVAL_BANDS,
        EVAL_PERMS,
        EVAL_ROWS,
        JACCARD_THRESHOLD,
        dedup_eval_minhash_lsh,
    )

    shingles = {}
    for r in (
        read_table(spark, SF, "documents").select("doc_id", "text").collect()
    ):
        toks = r["text"].split(" ")
        shingles[r["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    shingles = {d: s for d, s in shingles.items() if s}

    def h15(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sig = {
        d: [
            min(h15(f"mh{i}:{sh}") for sh in ss)
            for i in range(EVAL_PERMS)
        ]
        for d, ss in shingles.items()
    }
    buckets = collections.defaultdict(list)
    for d, hs in sig.items():
        for b in range(EVAL_BANDS):
            key = (
                b,
                ",".join(
                    str(hs[b * EVAL_ROWS + r]) for r in range(EVAL_ROWS)
                ),
            )
            buckets[key].append(d)
    cands = set()
    for ds in buckets.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cands.add((ds[i], ds[j]))
    truth = set()
    docs = sorted(shingles)
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = docs[i], docs[j]
            inter = len(shingles[a] & shingles[b])
            if inter == 0:
                continue
            if inter / (len(shingles[a]) + len(shingles[b]) - inter) >= (
                JACCARD_THRESHOLD
            ):
                truth.add((a, b))
    detected = truth & cands

    rows = dedup_eval_minhash_lsh(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_true"] == len(truth)
    assert r["n_candidates"] == len(cands)
    assert r["n_detected"] == len(detected)
    if truth:
        assert abs(r["lsh_recall"] - len(detected) / len(truth)) < 1e-6
    if cands:
        assert (
            abs(r["candidate_precision"] - len(detected) / len(cands))
            < 1e-6
        )


def test_chi_square_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_chi_square_independence,
    )

    cells = collections.Counter()
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .collect()
    ):
        cells[(r["o_orderstatus"], r["o_orderpriority"])] += 1
    rm = collections.Counter()
    cm = collections.Counter()
    for (s, p), o in cells.items():
        rm[s] += o
        cm[p] += o
    n = sum(cells.values())
    chi2 = sum(
        (o - rm[s] * cm[p] / n) ** 2 / (rm[s] * cm[p] / n)
        for (s, p), o in cells.items()
    )
    df = (len(rm) - 1) * (len(cm) - 1)

    rows = agg_chi_square_independence(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_orders"], r["df"]) == (n, df)
    assert abs(r["chi2"] - chi2) < 1e-4
    assert r["chi2"] >= 0.0


def test_halfsample_ci_matches_pure_python(spark):
    import hashlib

    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.sampling import (
        HS_B,
        agg_halfsample_ci,
    )

    rows_in = [
        (r["o_orderkey"], int(_round_half_away(r["o_totalprice"] * 10000)))
        for r in read_table(spark, SF, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    ]
    n_all = len(rows_in)
    s_all = sum(v for _, v in rows_in)
    mean = s_all / (n_all * 10000.0)
    mqs = []
    for r in range(HS_B):
        s = n = 0
        for k, v in rows_in:
            h = int(hashlib.md5(f"hs{r}:{k}".encode()).hexdigest()[:8], 16)
            if h % 2 == 0:
                s += v
                n += 1
        mqs.append(int(_round_half_away(s / (n * 10000.0) * 1e6)))
    b = len(mqs)
    m2 = b * sum(m * m for m in mqs) - sum(mqs) ** 2
    se = math.sqrt(m2) / (b * 1e6 * math.sqrt(2.0))

    out = agg_halfsample_ci(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_orders"], r["n_replicates"]) == (n_all, b)
    assert abs(r["mean_price"] - mean) < 1e-3
    assert abs(r["se_mean"] - se) < 1e-5
    assert abs(r["ci_lo"] - (mean - 1.96 * se)) < 1e-3
    assert abs(r["ci_hi"] - (mean + 1.96 * se)) < 1e-3
    assert r["ci_lo"] < r["mean_price"] < r["ci_hi"]
    # the CI should bracket plausibly: SE of a ~1500-row mean with
    # price sd ~1e5 is a few thousand — sanity bounds only
    assert 0.0 < r["se_mean"] < r["mean_price"]


def test_bollinger_bands_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        BB_W,
        window_bollinger_bands,
    )

    want = {}
    for key, by_mon in _monthly_scaled(spark).items():
        mons = sorted(by_mon)
        for i, mon in enumerate(mons):
            frame = [by_mon[m] for m in mons[max(0, i - BB_W + 1) : i + 1]]
            w = len(frame)
            mean = sum(frame) / (w * 10000.0)
            var = (
                w * sum(v * v for v in frame) - sum(frame) ** 2
            ) / (w * 10000.0) ** 2
            sd = math.sqrt(var)
            rev = by_mon[mon] / 10000.0
            want[(key, mon)] = (
                rev,
                mean,
                mean + 2 * sd,
                mean - 2 * sd,
                1 if (rev > mean + 2 * sd or rev < mean - 2 * sd) else 0,
            )

    rows = window_bollinger_bands(spark, SF).collect()
    assert len(rows) == len(want)
    n_outside = 0
    for r in rows:
        k = (r["priority"], (r["mon"].year, r["mon"].month))
        rev, mid, up, lo, out = want[k]
        assert abs(r["revenue"] - rev) < 1e-6
        assert abs(r["mid"] - mid) < 1e-3
        assert abs(r["upper_band"] - up) < 1e-3
        assert abs(r["lower_band"] - lo) < 1e-3
        assert r["outside"] == out
        n_outside += r["outside"]
    # the bands should be mostly containing (a 2-sigma envelope)
    assert n_outside < 0.2 * len(rows)


def test_lexical_diversity_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.text import (
        text_lexical_diversity,
    )

    want = {}
    for r in (
        read_table(spark, SF, "documents").select("doc_id", "text").collect()
    ):
        toks = r["text"].split(" ")
        want[r["doc_id"]] = (len(toks), len(set(toks)))

    rows = text_lexical_diversity(spark, SF).collect()
    assert len(rows) == len(want)
    for r in rows:
        nt, ny = want[r["doc_id"]]
        assert (r["n_tokens"], r["n_types"]) == (nt, ny)
        assert abs(r["ttr"] - ny / nt) < 1e-6
        assert abs(r["guiraud_r"] - ny / math.sqrt(nt)) < 1e-6
        assert 0.0 < r["ttr"] <= 1.0


def test_kruskal_wallis_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_kruskal_wallis,
    )

    vals = [
        (
            r["o_orderpriority"],
            int(_round_half_away(r["o_totalprice"] * 10000)),
        )
        for r in read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ]
    vals.sort(key=lambda t: t[1])
    ranks = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j][1] == vals[i][1]:
            j += 1
        ranks[vals[i][1]] = (i + 1 + j) / 2.0
        i = j
    by_g = collections.defaultdict(list)
    for g, v in vals:
        by_g[g].append(ranks[v])
    n = len(vals)
    s = sum(sum(rs) ** 2 / len(rs) for rs in by_g.values())
    h = 12.0 * s / (n * (n + 1)) - 3 * (n + 1)
    cnt = collections.Counter(v for _, v in vals)
    t3t = sum(t**3 - t for t in cnt.values())
    hc = h / (1 - t3t / (n**3 - n))

    rows = agg_kruskal_wallis(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_orders"], r["df"]) == (n, len(by_g) - 1)
    assert abs(r["h_stat"] - h) < 1e-3
    assert abs(r["h_corrected"] - hc) < 1e-3
    assert r["h_corrected"] >= r["h_stat"] - 1e-9  # correction inflates


def test_assortativity_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.graph import (
        CC_MIN_SUPPORT,
        graph_degree_assortativity,
    )

    baskets = collections.defaultdict(collections.Counter)
    for r in (
        read_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        baskets[r["l_orderkey"]][r["l_partkey"]] += 1
    sup = collections.Counter()
    for cnt in baskets.values():
        ps = sorted(cnt)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                sup[(ps[i], ps[j])] += cnt[ps[i]] * cnt[ps[j]]
    und = [e for e, s in sup.items() if s >= CC_MIN_SUPPORT]
    deg = collections.Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    jk = [(deg[a], deg[b]) for a, b in und] + [
        (deg[b], deg[a]) for a, b in und
    ]
    m = len(jk)
    s1 = sum(j for j, _ in jk)
    s2 = sum(j * j for j, _ in jk)
    s3 = sum(j * k for j, k in jk)
    r_want = (m * s3 - s1 * s1) / (m * s2 - s1 * s1)

    rows = graph_degree_assortativity(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_edges"] == len(und)
    assert abs(r["assortativity"] - r_want) < 1e-6
    assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9


def test_ks_two_sample_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        MW_GROUP_A,
        MW_GROUP_B,
        agg_ks_two_sample,
    )

    xs, ys = [], []
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        v = int(_round_half_away(r["o_totalprice"] * 10000))
        if r["o_orderpriority"] == MW_GROUP_A:
            xs.append(v)
        elif r["o_orderpriority"] == MW_GROUP_B:
            ys.append(v)
    n1, n2 = len(xs), len(ys)
    values = sorted(set(xs) | set(ys))
    xs.sort()
    ys.sort()
    import bisect

    d_num = max(
        abs(
            n2 * bisect.bisect_right(xs, v)
            - n1 * bisect.bisect_right(ys, v)
        )
        for v in values
    )
    d = d_num / (n1 * n2)
    lam = d * math.sqrt(n1 * n2 / (n1 + n2))

    rows = agg_ks_two_sample(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_urgent"], r["n_low"]) == (n1, n2)
    assert abs(r["d_stat"] - d) < 1e-6
    assert abs(r["ks_lambda"] - lam) < 1e-6
    assert 0.0 <= r["d_stat"] <= 1.0


def test_spearman_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_spearman_rank_corr,
    )

    cnt = collections.Counter()
    for r in read_table(spark, SF, "lineitem").select("l_orderkey").collect():
        cnt[r["l_orderkey"]] += 1
    pairs = []
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    ):
        if r["o_orderkey"] in cnt:
            pairs.append(
                (
                    int(_round_half_away(r["o_totalprice"] * 10000)),
                    cnt[r["o_orderkey"]],
                )
            )

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while (
                j < len(order) and vals[order[j]] == vals[order[i]]
            ):
                j += 1
            for k in range(i, j):
                ranks[order[k]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    rx = avg_ranks([p[0] for p in pairs])
    ry = avg_ranks([p[1] for p in pairs])
    m = len(pairs)
    mx = sum(rx) / m
    my = sum(ry) / m
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    rho = num / den

    rows = agg_spearman_rank_corr(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_orders"] == m
    assert abs(r["spearman_rho"] - rho) < 1e-6
    assert -1.0 - 1e-9 <= r["spearman_rho"] <= 1.0 + 1e-9
