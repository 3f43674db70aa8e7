"""Independent-reference tests for the round-13 fourth/fifth/sixth
batches (cohort LTV through the Hurst exponent) — each operator
replicated in pure python at sf0.001 (the test_round13_ops.py device:
the DuckDB oracle checks cross-engine parity; these pin the SEMANTICS
against a from-scratch implementation that shares no code)."""

from __future__ import annotations

import collections
import datetime
import math
import re

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table

SF = "/root/testdata/sf0.001"


def _round_half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _month_start(ts: datetime.datetime) -> datetime.datetime:
    return datetime.datetime(ts.year, ts.month, 1)


def _orders(spark):
    return (
        read_table(spark, SF, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            "o_orderdate",
            "o_totalprice",
        )
        .collect()
    )


def _ols_slope(pts):
    """(slope_num, slope_den) of y on x over integer points."""
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    return n * sxy - sx * sy, n * sxx - sx * sx


# --- wave 4 ---------------------------------------------------------------------------


def test_cohort_ltv_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        rollup_cohort_ltv,
    )

    rows = _orders(spark)
    cohort = {}
    for r in rows:
        m = _month_start(r["o_orderdate"])
        k = r["o_custkey"]
        if k not in cohort or m < cohort[k]:
            cohort[k] = m
    cells = collections.defaultdict(lambda: [0, set()])
    for r in rows:
        m = _month_start(r["o_orderdate"])
        c = cohort[r["o_custkey"]]
        off = (m.year - c.year) * 12 + (m.month - c.month)
        cell = cells[(c, off)]
        cell[0] += _round_half_away(r["o_totalprice"] * 10000)
        cell[1].add(r["o_custkey"])
    coh_n = collections.Counter(cohort.values())
    got = rollup_cohort_ltv(spark, SF).collect()
    assert len(got) == len(cells)
    for g in got:
        key = (g["cohort_month"], g["offset_months"])
        rev_s, actives = cells[key]
        assert g["active_customers"] == len(actives)
        assert g["cohort_customers"] == coh_n[g["cohort_month"]]
        assert abs(g["month_revenue"] - rev_s / 10000.0) < 1e-3
        cum = sum(
            cells[(g["cohort_month"], o)][0]
            for o in range(g["offset_months"] + 1)
            if (g["cohort_month"], o) in cells
        )
        assert abs(g["cum_revenue"] - cum / 10000.0) < 1e-3
        assert (
            abs(
                g["cum_ltv_per_customer"]
                - cum / 10000.0 / coh_n[g["cohort_month"]]
            )
            < 1e-3
        )


def test_mutual_information_matches_textbook(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_mutual_information,
    )

    cnt = collections.Counter(
        (r["o_orderstatus"], r["o_orderpriority"]) for r in _orders(spark)
    )
    n = sum(cnt.values())
    rmarg = collections.Counter()
    cmarg = collections.Counter()
    for (s, p), c in cnt.items():
        rmarg[s] += c
        cmarg[p] += c

    def h(counts):
        return -sum(c / n * math.log(c / n) for c in counts.values())

    hr, hc = h(rmarg), h(cmarg)
    hj = h(cnt)
    mi = hr + hc - hj
    g = agg_mutual_information(spark, SF).collect()[0]
    assert g["n_orders"] == n
    assert g["n_status"] == len(rmarg)
    assert g["n_priority"] == len(cmarg)
    assert abs(g["h_status"] - hr) < 1e-5
    assert abs(g["h_priority"] - hc) < 1e-5
    assert abs(g["h_joint"] - hj) < 1e-5
    assert abs(g["mi_nats"] - mi) < 1e-5
    assert abs(g["nmi"] - mi / math.sqrt(hr * hc)) < 1e-5


def _monthly_scaled(rows, key=None):
    m = collections.defaultdict(int)
    for r in rows:
        k = _month_start(r["o_orderdate"])
        if key is not None:
            k = (key(r), k)
        m[k] += _round_half_away(r["o_totalprice"] * 10000)
    return m


def test_ar1_halflife_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        timeseries_ar1_halflife,
    )

    series = _monthly_scaled(_orders(spark))
    ys = [series[k] for k in sorted(series)]
    pts = list(zip(ys[:-1], ys[1:]))
    num, den = _ols_slope(pts)
    phi = num / den
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    intercept = (sy - phi * sx) / n / 10000.0
    g = timeseries_ar1_halflife(spark, SF).collect()[0]
    assert g["n_pairs"] == n
    assert abs(g["phi"] - phi) < 1e-5
    assert abs(g["intercept_monthly"] - intercept) < 1e-2
    if 0 < phi < 1:
        assert abs(g["halflife_months"] - math.log(0.5) / math.log(phi)) < 1e-4
    else:
        assert g["halflife_months"] is None


def test_key_uniqueness_matches_counters(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        dq_key_uniqueness,
    )

    rows = _orders(spark)
    by_key = {
        "o_orderkey": collections.Counter(r["o_orderkey"] for r in rows),
        "o_custkey,o_orderdate": collections.Counter(
            (r["o_custkey"], r["o_orderdate"]) for r in rows
        ),
    }
    got = {r["candidate_key"]: r for r in dq_key_uniqueness(spark, SF).collect()}
    assert set(got) == set(by_key)
    for name, cnt in by_key.items():
        g = got[name]
        assert g["n_rows"] == sum(cnt.values())
        assert g["n_groups"] == len(cnt)
        assert g["dup_groups"] == sum(1 for c in cnt.values() if c > 1)
        assert g["dup_rows"] == sum(c - 1 for c in cnt.values() if c > 1)
        assert g["max_multiplicity"] == max(cnt.values())
        assert g["is_unique"] == int(len(cnt) == sum(cnt.values()))


def test_rolling_ols_slope_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        window_rolling_ols_slope,
    )

    rows = _orders(spark)
    series = _monthly_scaled(rows, key=lambda r: r["o_orderpriority"])
    by_p = collections.defaultdict(dict)
    for (p, m), v in series.items():
        by_p[p][m] = v
    expected = {}
    for p, mm in by_p.items():
        months = sorted(mm)
        for i in range(5, len(months)):
            pts = [(j + 1, mm[months[j]]) for j in range(i - 5, i + 1)]
            num, den = _ols_slope(pts)
            expected[(p, months[i])] = (
                num / den / 10000.0,
                sum(v for _, v in pts) / 6 / 10000.0,
            )
    got = window_rolling_ols_slope(spark, SF).collect()
    assert len(got) == len(expected)
    for g in got:
        slope, mean = expected[(g["priority"], g["month"])]
        assert abs(g["slope_monthly"] - slope) < 1e-3
        assert abs(g["mean_monthly"] - mean) < 1e-3


def test_readability_matches_regex_reference(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.text import (
        text_readability,
    )

    per_src = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in read_table(spark, SF, "documents").select("source", "text").collect():
        w = len(r["text"].split(" "))
        s_raw = len(re.findall(r"[.!?]+", r["text"]))
        syl = len(re.findall(r"[aeiouyAEIOUY]+", r["text"]))
        s = s_raw if s_raw > 0 else (w + 19) // 20
        a = per_src[r["source"]]
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += syl
    got = text_readability(spark, SF).collect()
    assert len(got) == len(per_src)
    for g in got:
        nd, w, s, syl = per_src[g["source"]]
        assert (g["n_docs"], g["n_words"], g["n_sentences"], g["n_syllables"]) == (
            nd,
            w,
            s,
            syl,
        )
        fre = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        assert abs(g["words_per_sentence"] - w / s) < 1e-5
        assert abs(g["syllables_per_word"] - syl / w) < 1e-5
        assert abs(g["flesch_reading_ease"] - fre) < 1e-3


def test_sentiment_lexicon_matches_counts(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.text import (
        _SENT_NEG,
        _SENT_POS,
        text_sentiment_lexicon,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    got = text_sentiment_lexicon(spark, SF).collect()
    assert len(got) == len(docs)
    for g in got:
        toks = docs[g["doc_id"]].split(" ")
        pos = sum(1 for t in toks if t in _SENT_POS)
        neg = sum(1 for t in toks if t in _SENT_NEG)
        assert (g["n_tokens"], g["n_pos"], g["n_neg"]) == (len(toks), pos, neg)
        if pos + neg > 0:
            assert abs(g["polarity"] - (pos - neg) / (pos + neg)) < 1e-5
        else:
            assert g["polarity"] is None
        assert abs(g["subjectivity"] - (pos + neg) / len(toks)) < 1e-5


def _support_edges(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.graph import (
        CC_MIN_SUPPORT,
    )

    # ROW-pair support, not set-pair: the operator self-joins lineitem
    # rows, so duplicate part rows within an order count multiply
    baskets = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    ):
        baskets[r["l_orderkey"]].append(r["l_partkey"])
    sup = collections.Counter()
    for parts in baskets.values():
        mult = collections.Counter(parts)
        ks = sorted(mult)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                sup[(ks[i], ks[j])] += mult[ks[i]] * mult[ks[j]]
    adj = collections.defaultdict(set)
    for (a, b), c in sup.items():
        if c >= CC_MIN_SUPPORT:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def test_bfs_hops_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.graph import (
        graph_bfs_hops,
    )

    adj = _support_edges(spark)
    seed = min(adj)
    dist = {seed: 0}
    frontier = [seed]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    got = {r["part"]: r["hops"] for r in graph_bfs_hops(spark, SF).collect()}
    assert got == dist


# --- wave 5 ---------------------------------------------------------------------------


def _scd2_intervals(rows):
    """custkey -> list of (priority, valid_from, valid_to_exclusive|None)."""
    per_cust = collections.defaultdict(list)
    for r in rows:
        per_cust[r["o_custkey"]].append(
            (r["o_orderdate"], r["o_orderkey"], r["o_orderpriority"])
        )
    out = {}
    for k, evs in per_cust.items():
        evs.sort()
        runs = []
        for d, _, p in evs:
            if not runs or runs[-1][0] != p:
                runs.append([p, d])
        iv = []
        for i, (p, start) in enumerate(runs):
            end = runs[i + 1][1] if i + 1 < len(runs) else None
            # Kimball first-row convention: version 1 covers all history
            iv.append((p, None if i == 0 else start, end))
        out[k] = iv
    return out


def test_scd2_point_in_time_join_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.olap import (
        scd2_point_in_time_join,
    )

    orows = _orders(spark)
    intervals = _scd2_intervals(orows)
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in orows}
    agg = collections.defaultdict(lambda: [0, 0])
    for r in (
        read_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_shipdate", "l_extendedprice")
        .collect()
    ):
        cust = cust_of[r["l_orderkey"]]
        ship = r["l_shipdate"]
        hit = None
        for p, start, end in intervals[cust]:
            if (start is None or ship >= start) and (
                end is None or ship < end
            ):
                hit = p
                break
        assert hit is not None
        cell = agg[(hit, ship.year)]
        cell[0] += 1
        cell[1] += _round_half_away(r["l_extendedprice"] * 10000)
    got = scd2_point_in_time_join(spark, SF).collect()
    assert len(got) == len(agg)
    for g in got:
        n, rev = agg[(g["priority_at_ship"], g["ship_year"])]
        assert g["n_items"] == n
        assert abs(g["revenue"] - rev / 10000.0) < 1e-3


def test_price_elasticity_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        _ELAST_SCALE,
        agg_price_elasticity,
    )

    brand_of = {
        r["p_partkey"]: r["p_brand"]
        for r in read_table(spark, SF, "part").select("p_partkey", "p_brand").collect()
    }
    pts = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .collect()
    ):
        x = _round_half_away(
            math.log(r["l_extendedprice"] / r["l_quantity"]) * _ELAST_SCALE
        )
        y = _round_half_away(math.log(r["l_quantity"]) * _ELAST_SCALE)
        pts[brand_of[r["l_partkey"]]].append((x, y))
    got = {r["brand"]: r for r in agg_price_elasticity(spark, SF).collect()}
    for brand, p in pts.items():
        num, den_x = _ols_slope(p)
        n = len(p)
        sy = sum(q[1] for q in p)
        syy = sum(q[1] * q[1] for q in p)
        den_y = n * syy - sy * sy
        if den_x <= 0 or den_y <= 0:
            assert brand not in got
            continue
        g = got[brand]
        assert g["n_items"] == n
        assert abs(g["elasticity"] - num / den_x) < 1e-5
        assert abs(g["r2"] - num * num / (den_x * den_y)) < 1e-5


def test_cascade_rerank_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.similarity import (
        CASCADE_L1,
        N_QUERIES,
        TOP_K,
        sim_search_cascade_rerank,
    )

    vecs = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in read_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    codes, scales = {}, {}
    for vid, e in vecs.items():
        s = max(abs(v) for v in e) / 127.0
        if s <= 0:
            continue
        scales[vid] = s
        codes[vid] = [_round_half_away(v / s) for v in e]

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    expected = {}
    for q in range(N_QUERIES):
        scored = []
        for c in sorted(codes):
            if c < N_QUERIES:
                continue
            d = sum(a * b for a, b in zip(codes[q], codes[c]))
            scored.append((round(d * scales[q] * scales[c], 6), c))
        scored.sort(key=lambda t: (-t[0], t[1]))
        surv = scored[:CASCADE_L1]
        rr = sorted(
            ((round(cos(vecs[q], vecs[c]), 6), c) for _, c in surv),
            key=lambda t: (-t[0], t[1]),
        )[:TOP_K]
        for rank, (cv, c) in enumerate(rr, 1):
            expected[(q, rank)] = (c, cv)
    got = sim_search_cascade_rerank(spark, SF).collect()
    assert len(got) == N_QUERIES * TOP_K
    for g in got:
        c, cv = expected[(g["query_id"], g["rank"])]
        assert g["neighbor_id"] == c
        assert abs(g["cosine"] - cv) < 1e-5


def _phi_tail(z):
    """A&S 26.2.17 two-sided p-value, as in the operator."""
    t = 1.0 / (1.0 + 0.2316419 * abs(z))
    poly = (
        0.319381530 * t
        - 0.356563782 * t**2
        + 1.781477937 * t**3
        - 1.821255978 * t**4
        + 1.330274429 * t**5
    )
    return 2.0 * (math.exp(-0.5 * z * z) / math.sqrt(2 * math.pi)) * poly


def test_benjamini_hochberg_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        _BH_Q,
        MW_GROUP_A,
        MW_GROUP_B,
        agg_benjamini_hochberg,
    )

    per_year = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in _orders(spark):
        if r["o_orderpriority"] not in (MW_GROUP_A, MW_GROUP_B):
            continue
        a = per_year[r["o_orderdate"].year]
        is_a = r["o_orderpriority"] == MW_GROUP_A
        done = r["o_orderstatus"] == "F"
        a[0] += is_a
        a[1] += not is_a
        a[2] += is_a and done
        a[3] += (not is_a) and done
    tests = {}
    for y, (n1, n2, x1, x2) in per_year.items():
        if not (0 < x1 + x2 < n1 + n2 and n1 > 0 and n2 > 0):
            continue
        p1, p2 = x1 / n1, x2 / n2
        pp = (x1 + x2) / (n1 + n2)
        z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
        tests[y] = (n1, n2, x1, x2, z, _phi_tail(z))
    m = len(tests)
    order = sorted(tests, key=lambda y: (tests[y][5], y))
    k_max = 0
    for i, y in enumerate(order, 1):
        if tests[y][5] <= i / m * _BH_Q:
            k_max = i
    got = {r["ship_year"]: r for r in agg_benjamini_hochberg(spark, SF).collect()}
    assert set(got) == set(tests)
    for i, y in enumerate(order, 1):
        g = got[y]
        n1, n2, x1, x2, z, p = tests[y]
        assert (g["n1"], g["n2"], g["x1"], g["x2"]) == (n1, n2, x1, x2)
        assert abs(g["z_score"] - z) < 1e-5
        assert abs(g["p_value"] - p) < 1e-5
        assert g["p_rank"] == i
        assert g["m_tests"] == m
        assert g["rejected"] == int(i <= k_max)


# --- wave 6 ---------------------------------------------------------------------------


def test_trimmed_mean_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_trimmed_mean,
    )

    per_year = collections.defaultdict(list)
    for r in _orders(spark):
        per_year[r["o_orderdate"].year].append(
            (r["o_totalprice"], r["o_orderkey"])
        )
    got = {r["year"]: r for r in agg_trimmed_mean(spark, SF).collect()}
    assert set(got) == set(per_year)
    for y, vals in per_year.items():
        vals.sort()
        n = len(vals)
        k = n // 10
        kept = [_round_half_away(v * 10000) for v, _ in vals[k : n - k]]
        allv = [_round_half_away(v * 10000) for v, _ in vals]
        g = got[y]
        assert (g["n_orders"], g["k_trim"]) == (n, k)
        assert abs(g["mean_price"] - sum(allv) / 10000.0 / n) < 1e-3
        assert (
            abs(g["trimmed_mean_price"] - sum(kept) / 10000.0 / len(kept)) < 1e-3
        )


def test_heaps_law_fit_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.text import (
        _HEAPS_SCALE,
        corpus_heaps_law_fit,
    )

    per_src = collections.defaultdict(collections.Counter)
    for r in read_table(spark, SF, "documents").select("source", "text").collect():
        per_src[r["source"]].update(r["text"].split(" "))
    pts = []
    for cnt in per_src.values():
        n_tok = sum(cnt.values())
        vocab = len(cnt)
        pts.append(
            (
                _round_half_away(math.log(n_tok) * _HEAPS_SCALE),
                _round_half_away(math.log(vocab) * _HEAPS_SCALE),
            )
        )
    num, den_x = _ols_slope(pts)
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    den_y = n * syy - sy * sy
    beta = num / den_x
    k = math.exp((sy - beta * sx) / n / _HEAPS_SCALE)
    g = corpus_heaps_law_fit(spark, SF).collect()[0]
    assert g["n_sources"] == n
    assert abs(g["beta"] - beta) < 1e-5
    assert abs(g["k_coeff"] - k) < 1e-3
    assert abs(g["r2"] - num * num / (den_x * den_y)) < 1e-5


def _decompose_components(rows):
    """priority -> list of (rev_s, d24, s_cent_num, n_moy) per overlap month,
    replicating the exact-integer classical-decompose pipeline."""
    series = collections.defaultdict(dict)
    for r in rows:
        m = _month_start(r["o_orderdate"])
        series[r["o_orderpriority"]][m] = series[r["o_orderpriority"]].get(
            m, 0
        ) + _round_half_away(r["o_totalprice"] * 10000)
    out = {}
    for p, mm in series.items():
        months = sorted(mm)
        ys = [mm[m] for m in months]
        t_rows = []
        for i in range(6, len(ys) - 6):
            t24 = 2 * sum(ys[i - 5 : i + 6]) + ys[i - 6] + ys[i + 6]
            d24 = 24 * ys[i] - t24
            t_rows.append((months[i].month, ys[i], d24))
        per_moy = collections.defaultdict(lambda: [0, 0])
        for moy, _, d24 in t_rows:
            per_moy[moy][0] += d24
            per_moy[moy][1] += 1
        s_micro = {}
        for moy, (sum_d, cnt) in per_moy.items():
            mag = (2 * abs(25 * sum_d) + 6 * cnt) // (12 * cnt)
            s_micro[moy] = mag if sum_d >= 0 else -mag
        n_moy = len(s_micro)
        tot = sum(s_micro.values())
        out[p] = [
            (y, d24, n_moy * s_micro[moy] - tot, n_moy)
            for moy, y, d24 in t_rows
        ]
    return out


def test_seasonal_strength_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        timeseries_seasonal_strength,
    )

    comp = _decompose_components(_orders(spark))
    got = {r["priority"]: r for r in timeseries_seasonal_strength(spark, SF).collect()}
    for p, rows in comp.items():
        r_u = [25 * n * d24 - 6 * sc for _, d24, sc, n in rows]
        d_u = [25 * n * d24 for _, d24, _, n in rows]
        ys_u = [600 * n * y - 6 * sc for y, _, sc, n in rows]

        def var_num(v):
            n_o = len(v)
            return n_o * sum(x * x for x in v) - sum(v) ** 2

        vr, vd, vy = var_num(r_u), var_num(d_u), var_num(ys_u)
        if vd <= 0 or vy <= 0:
            assert p not in got
            continue
        g = got[p]
        assert g["n_months"] == len(rows)
        assert abs(g["f_trend"] - max(0.0, 1.0 - vr / vy)) < 1e-5
        assert abs(g["f_seasonal"] - max(0.0, 1.0 - vr / vd)) < 1e-5


def test_hurst_rs_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        _HURST_SIZES,
        agg_hurst_rs,
    )

    series = _monthly_scaled(_orders(spark))
    ys = [series[k] for k in sorted(series)]
    t = len(ys)
    avg_rs = {}
    n_blocks = {}
    for b in _HURST_SIZES:
        rss = []
        for blk in range(t // b):
            block = ys[blk * b : (blk + 1) * b]
            s = sum(block)
            zs = [
                b * sum(block[: i + 1]) - (i + 1) * s for i in range(b)
            ]
            r_int = max(zs) - min(zs)
            den = b * sum(v * v for v in block) - s * s
            if den <= 0:
                continue
            rss.append(r_int / math.sqrt(den))
        if rss:
            n_blocks[b] = len(rss)
            avg_rs[b] = (
                sum(_round_half_away(r * 1_000_000_000) for r in rss)
                / 1_000_000_000
                / len(rss)
            )
    g = agg_hurst_rs(spark, SF).collect()[0]
    assert g["n_months"] == t
    for b in _HURST_SIZES:
        assert g[f"n_blocks_{b}"] == n_blocks.get(b)
        if b in avg_rs:
            assert abs(g[f"avg_rs_{b}"] - avg_rs[b]) < 1e-5
    if 8 in avg_rs and 32 in avg_rs:
        h = math.log(avg_rs[32] / avg_rs[8]) / (2 * math.log(2))
        assert abs(g["hurst"] - h) < 1e-4


# --- wave 7 ---------------------------------------------------------------------------


def test_ndcg_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.similarity import (
        _NDCG_SCALE,
        EVAL_K,
        N_QUERIES,
        sim_eval_ndcg,
    )

    rows = (
        read_table(spark, SF, "embeddings")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    vecs = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}
    cands = sorted(v for v in vecs if v >= N_QUERIES)
    label_tot = collections.Counter(labels[c] for c in cands)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    got = {r["query_id"]: r for r in sim_eval_ndcg(spark, SF).collect()}
    for q in range(N_QUERIES):
        ranked = sorted(
            ((round(cos(vecs[q], vecs[c]), 6), c) for c in cands),
            key=lambda t: (-t[0], t[1]),
        )[:EVAL_K]
        dcg_s = sum(
            _round_half_away(_NDCG_SCALE / math.log2(i + 1))
            for i, (_, c) in enumerate(ranked, 1)
            if labels[c] == labels[q]
        )
        m = min(EVAL_K, label_tot[labels[q]])
        idcg_s = sum(
            _round_half_away(_NDCG_SCALE / math.log2(i + 1))
            for i in range(1, m + 1)
        )
        g = got[q]
        assert g["n_hits"] == sum(
            1 for _, c in ranked if labels[c] == labels[q]
        )
        assert g["n_rel_total"] == label_tot[labels[q]]
        assert abs(g["dcg"] - dcg_s / _NDCG_SCALE) < 1e-5
        assert abs(g["idcg"] - idcg_s / _NDCG_SCALE) < 1e-5
        assert abs(g["ndcg"] - dcg_s / idcg_s) < 1e-5


def _quantile_cont(sorted_vals, f):
    """DuckDB quantile_cont / Spark percentile linear interpolation."""
    n = len(sorted_vals)
    pos = (n - 1) * f
    lo = int(math.floor(pos))
    hi = min(lo + 1, n - 1)
    frac = pos - lo
    return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * frac


def test_iqr_fences_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        dq_outlier_iqr_fences,
    )

    per_year = collections.defaultdict(list)
    for r in _orders(spark):
        per_year[r["o_orderdate"].year].append(r["o_totalprice"])
    got = {r["year"]: r for r in dq_outlier_iqr_fences(spark, SF).collect()}
    assert set(got) == set(per_year)
    for y, vals in per_year.items():
        vals.sort()
        q1 = _quantile_cont(vals, 0.25)
        q3 = _quantile_cont(vals, 0.75)
        lo = q1 - 1.5 * (q3 - q1)
        hi = q3 + 1.5 * (q3 - q1)
        g = got[y]
        assert g["n_orders"] == len(vals)
        assert abs(g["q1"] - q1) < 1e-3
        assert abs(g["q3"] - q3) < 1e-3
        assert g["n_below"] == sum(1 for v in vals if v < lo)
        assert g["n_above"] == sum(1 for v in vals if v > hi)


def test_kl_divergence_matches_textbook(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.text import (
        text_kl_divergence_by_source,
    )

    per_src = collections.defaultdict(collections.Counter)
    corpus = collections.Counter()
    for r in read_table(spark, SF, "documents").select("source", "text").collect():
        toks = r["text"].split(" ")
        per_src[r["source"]].update(toks)
        corpus.update(toks)
    n = sum(corpus.values())
    got = {r["source"]: r for r in text_kl_divergence_by_source(spark, SF).collect()}
    assert set(got) == set(per_src)
    for src, cnt in per_src.items():
        ns = sum(cnt.values())
        kl = sum(
            c / ns * math.log((c / ns) / (corpus[t] / n))
            for t, c in cnt.items()
        )
        g = got[src]
        assert g["n_tokens"] == ns
        assert g["vocab"] == len(cnt)
        assert abs(g["kl_nats"] - kl) < 1e-5


# --- wave 8 ---------------------------------------------------------------------------


def test_entropy_rate_matches_textbook(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        events_entropy_rate_markov,
    )

    per_user = collections.defaultdict(list)
    for r in (
        read_table(spark, SF, "events")
        .select("user_id", "ts", "event_type", "event_id")
        .collect()
    ):
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    cells = collections.Counter()
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            cells[(a, b)] += 1
    n = sum(cells.values())
    rows = collections.Counter()
    for (a, _), c in cells.items():
        rows[a] += c
    h = -sum(c / n * math.log(c / rows[a]) for (a, _), c in cells.items())
    g = events_entropy_rate_markov(spark, SF).collect()[0]
    assert g["n_transitions"] == n
    assert g["n_states"] == len(rows)
    assert g["n_cells"] == len(cells)
    assert abs(g["entropy_rate_nats"] - h) < 1e-5
    assert abs(g["max_entropy_nats"] - math.log(len(rows))) < 1e-5
    assert abs(g["efficiency"] - h / math.log(len(rows))) < 1e-5


def test_cohens_d_matches_textbook(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        MW_GROUP_A,
        MW_GROUP_B,
        agg_cohens_d_effect_size,
    )

    ga, gb = [], []
    for r in _orders(spark):
        v = _round_half_away(r["o_totalprice"] * 10000)
        if r["o_orderpriority"] == MW_GROUP_A:
            ga.append(v)
        elif r["o_orderpriority"] == MW_GROUP_B:
            gb.append(v)
    n1, n2 = len(ga), len(gb)
    m1, m2 = sum(ga) / n1, sum(gb) / n2
    ss1 = sum(v * v for v in ga) - m1 * sum(ga)
    ss2 = sum(v * v for v in gb) - m2 * sum(gb)
    sp = math.sqrt((ss1 + ss2) / (n1 + n2 - 2))
    d = (m1 - m2) / sp
    gfac = 1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)
    g = agg_cohens_d_effect_size(spark, SF).collect()[0]
    assert (g["n1"], g["n2"]) == (n1, n2)
    assert abs(g["mean_urgent"] - m1 / 10000.0) < 1e-3
    assert abs(g["pooled_sd"] - sp / 10000.0) < 1e-3
    assert abs(g["cohens_d"] - d) < 1e-5
    assert abs(g["hedges_g"] - d * gfac) < 1e-5


def test_burstiness_fano_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.text import (
        BURST_TOP_K,
        text_burstiness_fano,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text").collect()
    d = len(docs)
    per_tok_doc = collections.Counter()
    for r in docs:
        for t in r["text"].split(" "):
            per_tok_doc[(t, r["doc_id"])] += 1
    agg = collections.defaultdict(lambda: [0, 0, 0])  # df, s, q
    for (t, _), c in per_tok_doc.items():
        a = agg[t]
        a[0] += 1
        a[1] += c
        a[2] += c * c
    ranked = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[
        :BURST_TOP_K
    ]
    got = text_burstiness_fano(spark, SF).collect()
    assert [r["tok"] for r in got] == [t for t, _ in ranked]
    for g, (t, (df, s, q)) in zip(got, ranked):
        assert (g["doc_freq"], g["total_count"], g["n_docs"]) == (df, s, d)
        assert abs(g["mean_per_doc"] - s / d) < 1e-5
        assert abs(g["fano"] - (d * q - s * s) / (d * s)) < 1e-5
