"""Independent-reference tests for the round-13 additions: ACF vs a
pure-python replication, RA link prediction vs brute force, BPE merge
learning vs a hand-rolled trainer, and greedy-selection invariants for
MMR and k-center (both are 2-pass greedy argmax loops whose classic
structural properties — monotone farthest-first radii, pool membership,
relevance-dominance of the seed pick — pin the semantics independently
of the DuckDB oracle)."""

from __future__ import annotations

import collections
import math

from u_s__non_farm_payrolls_an_olap_analysis_spark.io import read_table

SF = "/root/testdata/sf0.001"


def _round_half_away(x: float) -> float:
    return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)


def test_acf_matches_pure_python(spark):
    """Exact-integer ACF must equal the straightforward float formula to
    well past the 6-dp rounding (the integer form exists for cross-engine
    determinism, not to change the statistic)."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.analytics import (
        ACF_MAX_LAG,
        timeseries_acf,
    )

    series = collections.defaultdict(dict)
    for r in (
        read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_orderdate", "o_totalprice")
        .collect()
    ):
        mon = (r["o_orderdate"].year, r["o_orderdate"].month)
        key = r["o_orderpriority"]
        series[key][mon] = series[key].get(mon, 0) + int(
            _round_half_away(r["o_totalprice"] * 10000)
        )
    want = {}
    for key, by_mon in series.items():
        ys = [by_mon[m] for m in sorted(by_mon)]
        n = len(ys)
        mean = sum(ys) / n
        den = sum((y - mean) ** 2 for y in ys)
        for k in range(1, ACF_MAX_LAG + 1):
            num = sum(
                (ys[t] - mean) * (ys[t - k] - mean) for t in range(k, n)
            )
            want[(key, k)] = (num / den, 1.96 / math.sqrt(n))

    rows = timeseries_acf(spark, SF).collect()
    assert len(rows) == len(want)
    for r in rows:
        acf, ci = want[(r["priority"], r["lag_k"])]
        assert abs(r["acf"] - acf) < 5e-6
        assert abs(r["ci95"] - ci) < 5e-6
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9


def _token_und_edges(spark, sf):
    und = set()
    for r in read_table(spark, sf, "documents").select("text").collect():
        toks = r["text"].split(" ")
        for a, b in zip(toks, toks[1:]):
            if a != b:
                und.add((min(a, b), max(a, b)))
    return und


def test_ra_link_prediction_matches_brute_force(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.graph import (
        RA_MAX_DEG,
        RA_SCALE,
        RA_TOP_K,
        graph_link_prediction_ra,
    )

    und = _token_und_edges(spark, SF)
    nbrs = collections.defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    scores = collections.defaultdict(int)
    for z, ns in nbrs.items():
        deg = len(ns)
        if deg < 2 or deg > RA_MAX_DEG:
            continue
        w = int(_round_half_away(RA_SCALE / deg))
        ns_sorted = sorted(ns)
        for i in range(len(ns_sorted)):
            for j in range(i + 1, len(ns_sorted)):
                scores[(ns_sorted[i], ns_sorted[j])] += w
    preds = sorted(
        ((s, a, b) for (a, b), s in scores.items() if (a, b) not in und),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:RA_TOP_K]

    rows = graph_link_prediction_ra(spark, SF).collect()
    got = [(r["token_a"], r["token_b"], r["ra_score"]) for r in rows]
    want = [(a, b, s / RA_SCALE) for s, a, b in preds]
    assert len(got) == len(want)
    for (ga, gb, gs), (wa, wb, ws) in zip(got, want):
        assert (ga, gb) == (wa, wb)
        assert abs(gs - ws) < 1e-9


def _python_bpe(word_freq, n_merges):
    """Reference trainer: greedy left-to-right merges on symbol tuples."""
    vocab = {
        tuple(word): freq for word, freq in word_freq.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], pairs[best]))
        new_vocab = {}
        for syms, freq in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == best[0] and s == best[1]:
                    out[-1] = best[0] + best[1]
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def test_bpe_learn_merges_matches_pure_python(spark):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.llm_prep import (
        BPE_MERGES,
        vocab_bpe_learn_merges,
    )
    import re

    word_freq = collections.Counter()
    for r in read_table(spark, SF, "documents").select("text").collect():
        for w in r["text"].lower().split(" "):
            if re.fullmatch("[a-z]+", w) and len(w) >= 2:
                word_freq[w] += 1
    want = _python_bpe(word_freq, BPE_MERGES)

    rows = vocab_bpe_learn_merges(spark, SF).collect()
    got = [
        (r["left_sym"], r["right_sym"], r["weighted_count"]) for r in rows
    ]
    assert got == want
    assert [r["merge_rank"] for r in rows] == list(
        range(1, len(rows) + 1)
    )
    for r in rows:
        assert r["merged"] == r["left_sym"] + r["right_sym"]


def test_mmr_greedy_invariants(spark):
    """MMR structure: per query exactly MMR_K unique ranks; the rank-1
    pick is the relevance argmax; every mmr_score <= lambda * relevance
    (the diversity penalty only subtracts); picks are distinct."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.similarity import (
        MMR_D_NUM,
        MMR_DEN,
        MMR_K,
        MMR_L_NUM,
        sim_search_mmr_diversified,
    )

    lam = MMR_L_NUM / MMR_DEN
    rows = sim_search_mmr_diversified(spark, SF).collect()
    by_q = collections.defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r)
    assert by_q
    for qid, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, MMR_K + 1))
        ids = [r["neighbor_id"] for r in rs]
        assert len(set(ids)) == len(ids)
        first = next(r for r in rs if r["rank"] == 1)
        assert first["relevance"] == max(r["relevance"] for r in rs)
        assert abs(
            first["mmr_score"] - lam * first["relevance"]
        ) < 1e-9  # seed pays no diversity penalty
        for r in rs:
            # the diversity term is (1-lambda)*max_sim with |sim| <= 1,
            # so the score sits within that envelope of lambda*rel (a
            # NEGATIVE max-sim legitimately pushes the score above
            # lambda*rel — anti-correlated vectors are a diversity bonus)
            env = MMR_D_NUM / MMR_DEN + 1e-9
            assert lam * r["relevance"] - env <= r["mmr_score"]
            assert r["mmr_score"] <= lam * r["relevance"] + env


def test_kcenter_invariants(spark):
    """Farthest-first structure: seed is the lowest corpus vec_id with
    sel_dist 0; selection distances are non-increasing (the classic
    Gonzalez radius monotonicity); centers are distinct."""
    from u_s__non_farm_payrolls_an_olap_analysis_spark.operators.sampling import (
        KC_K,
        sample_coreset_kcenter,
    )

    rows = sample_coreset_kcenter(spark, SF).collect()
    assert [r["center_rank"] for r in rows] == list(range(1, KC_K + 1))
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    corpus_min = (
        read_table(spark, SF, "embeddings")
        .filter("vec_id >= 10")
        .agg({"vec_id": "min"})
        .collect()[0][0]
    )
    assert rows[0]["vec_id"] == corpus_min
    assert rows[0]["sel_dist"] == 0.0
    dists = [r["sel_dist"] for r in rows[1:]]
    assert all(d > 0 for d in dists)
    assert all(a >= b - 1e-9 for a, b in zip(dists, dists[1:]))
