"""Independent-reference tests for the round-12 additions:
connected components (union-find), sequence-pattern matching (pure-python
replay), and Kneser-Ney scoring (pure-python model replication)."""

from __future__ import annotations

import collections
import math

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table

SF = "/root/testdata/sf0.001"


def _copurchase_edges(spark, sf, min_support):
    baskets = collections.defaultdict(set)
    for r in read_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect():
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    pair_orders = collections.Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_orders[(ps[i], ps[j])] += 1
    return {p for p, n in pair_orders.items() if n >= min_support}


def test_connected_components_match_union_find(spark):
    """Min-label propagation must converge to the exact union-find
    components (component id = min part key; sizes exact)."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.graph import (
        CC_MIN_SUPPORT,
        graph_connected_components,
    )

    edges = _copurchase_edges(spark, SF, CC_MIN_SUPPORT)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {v: find(v) for v in parent}
    sizes = collections.Counter(comp.values())

    rows = graph_connected_components(spark, SF).collect()
    got = {r["part"]: (r["component"], r["comp_size"]) for r in rows}
    want = {v: (c, sizes[c]) for v, c in comp.items()}
    assert got == want
    assert len(sizes) >= 1 and got  # non-degenerate graph


def test_pattern_match_replays_event_walk(spark):
    """The last-non-click-anchor windows must emit exactly the matches a
    literal per-user walk finds for ``view (click)* purchase``."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        events_pattern_match,
    )

    by_user = collections.defaultdict(list)
    for r in read_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).collect():
        by_user[r["user_id"]].append(r)
    want = []
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        nc_type, nc_ts, clicks = None, None, 0
        for r in evs:
            if r["event_type"] == "purchase" and nc_type == "view":
                want.append(
                    (uid, nc_ts, r["ts"], r["event_id"], clicks, r["value"])
                )
            if r["event_type"] != "click":
                nc_type, nc_ts, clicks = r["event_type"], r["ts"], 0
            else:
                clicks += 1
    want.sort(key=lambda t: (t[0], t[2], t[3]))

    got = [
        (
            r["user_id"],
            r["view_ts"],
            r["purchase_ts"],
            r["purchase_event_id"],
            r["n_clicks"],
            r["purchase_value"],
        )
        for r in events_pattern_match(spark, SF).collect()
    ]
    assert got == want
    assert any(t[4] > 0 for t in want)  # some matches have clicks between


def _round_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def test_kneser_ney_matches_python_model(spark):
    """Spark KN scores must equal a literal python implementation of the
    interpolated KN formula with the module's exact float association
    and scaled-int64 per-doc summation."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.llm_prep import (
        KN_D,
        SURPRISAL_SCALE,
        quality_kneser_ney_logprob,
    )

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in read_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
        if r["text"] is not None
    }
    cu = collections.Counter()
    cb = collections.Counter()
    for did, toks in docs.items():
        if did % 2 == 0:
            cu.update(toks)
            cb.update(zip(toks, toks[1:]))
    n1p_fol = collections.Counter(p for p, _ in cb)
    n1p_ctx = collections.Counter(c for _, c in cb)
    n_types = len(cb)

    want = {}
    for did, toks in docs.items():
        if len(toks) < 2:
            continue
        acc, n = 0, 0
        for v, w in zip(toks, toks[1:]):
            pc = float(n1p_ctx.get(w, 1)) / float(n_types)
            if v in cu:
                p = max(float(cb.get((v, w), 0)) - KN_D, 0.0) / float(
                    cu[v]
                ) + (KN_D * float(n1p_fol.get(v, 1)) / float(cu[v])) * pc
            else:
                p = pc
            acc += _round_away(math.log(p) * SURPRISAL_SCALE)
            n += 1
        avg = float(acc) / SURPRISAL_SCALE / n
        want[did] = (n, _round_away(avg * 1e6) / 1e6)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in quality_kneser_ney_logprob(spark, SF).collect()
    }
    assert got == want
    assert got  # corpus produced scores


def test_theil_sen_matches_pure_python(spark):
    """Slope/intercept must equal the literal median-of-pairwise-slopes
    computation (python floats, same op order, same interpolated
    median)."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        agg_theil_sen_trend,
    )

    monthly = collections.defaultdict(dict)
    for r in read_table(spark, SF, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    ).collect():
        x = r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1 - 1995 * 12
        d = monthly[r["o_orderpriority"]]
        d[x] = d.get(x, 0) + _round_away(r["o_totalprice"] * 10000.0)

    def median(vals):
        v = sorted(vals)
        n = len(v)
        mid = n // 2
        return float(v[mid]) if n % 2 else (v[mid - 1] + v[mid]) / 2.0

    want = {}
    for pri, d in monthly.items():
        pts = sorted(d.items())
        slopes = [
            float(y2 - y1) / float(x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        ]
        sl = median(slopes)
        icpt = median([(float(y) - sl * float(x)) / 10000.0 for x, y in pts])
        want[pri] = (
            round(sl / 10000.0, 6),
            round(icpt, 4),
            len(slopes),
        )

    got = {
        r["priority"]: (r["ts_slope"], r["ts_intercept"], r["n_pairs"])
        for r in agg_theil_sen_trend(spark, SF).collect()
    }
    assert got == want


def test_mad_outliers_match_pure_python(spark):
    """MAD medians, outlier counts, and rates must equal the literal
    per-type computation."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        dq_anomaly_mad,
    )

    by_type = collections.defaultdict(list)
    for r in read_table(spark, SF, "events").select(
        "event_type", "value"
    ).collect():
        by_type[r["event_type"]].append(r["value"])

    def median(vals):
        v = sorted(vals)
        n = len(v)
        mid = n // 2
        return float(v[mid]) if n % 2 else (v[mid - 1] + v[mid]) / 2.0

    want = {}
    for t, vs in by_type.items():
        med = median(vs)
        mad = median([abs(x - med) for x in vs])
        n_out = sum(1 for x in vs if abs(x - med) > 3.0 * (1.4826 * mad))
        want[t] = (
            round(med, 4),
            round(mad, 4),
            n_out,
            len(vs),
            _round_away((n_out / len(vs)) * 1e6) / 1e6,
        )

    got = {
        r["event_type"]: (
            r["med"],
            r["mad"],
            r["n_outliers"],
            r["n"],
            r["outlier_rate"],
        )
        for r in dq_anomaly_mad(spark, SF).collect()
    }
    assert got == want
    assert any(w[2] > 0 for w in want.values())  # outliers actually exist


def test_systematic_resample_invariants(spark):
    """Copy counts must (a) sum exactly to SYS_DRAWS, (b) be each doc's
    floor or ceil of its proportional share N*w/W, and (c) match the
    literal position-walk definition u_k = (k+0.5)*W/N."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.sampling import (
        SYS_DRAWS,
        sample_systematic_resample,
    )

    weights = {
        r["doc_id"]: r["n_chars"]
        for r in read_table(spark, SF, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    ids = sorted(weights)
    W = sum(weights[d] for d in ids)
    counts = collections.Counter()
    c = 0
    bounds = []
    for d in ids:
        bounds.append((d, c, c + weights[d]))
        c += weights[d]
    k = 0
    for d, lo, hi in bounds:
        # positions are (k+0.5)*W/N in increasing order — walk them once
        while k < SYS_DRAWS and lo * 2 * SYS_DRAWS <= (2 * k + 1) * W < hi * 2 * SYS_DRAWS:
            counts[d] += 1
            k += 1

    got = {
        r["doc_id"]: r["n_copies"]
        for r in sample_systematic_resample(spark, SF).collect()
    }
    assert got == {d: n for d, n in counts.items() if n > 0}
    assert sum(got.values()) == SYS_DRAWS
    for d, n in got.items():
        share = SYS_DRAWS * weights[d] / W
        assert math.floor(share) <= n <= math.ceil(share)
