"""Space-Saving eviction-path properties: the registered streaming key is
exact on the fixtures (capacity above per-shard cardinality, oracle-checked
by the driver); these tests drive the SAME update function into eviction
with a tiny capacity and assert the published guarantees against a
pure-python reference."""

from __future__ import annotations

import pandas as pd
import pytest


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _run_stream(batches, capacity, monkeypatch):
    from u_s__non_farm_payrolls_an_olap_analysis_spark.streaming import (
        stateful,
    )

    monkeypatch.setattr(stateful, "SS_CAPACITY", capacity)
    st = _FakeState()
    out = None
    for b in batches:
        frames = list(
            stateful._space_saving_update(
                (0,), iter([pd.DataFrame({"item": b})]), st
            )
        )
        out = frames[-1]
    return out


def _reference_space_saving(stream, capacity):
    """Literal Metwally et al. 2005 algorithm, one item at a time."""
    tbl = {}
    for it in stream:
        if it in tbl:
            c, e = tbl[it]
            tbl[it] = (c + 1, e)
        elif len(tbl) < capacity:
            tbl[it] = (1, 0)
        else:
            victim = min(tbl, key=lambda k: (tbl[k][0], k))
            vc, _ = tbl.pop(victim)
            tbl[it] = (vc + 1, vc)
    return tbl


def test_space_saving_bounds_under_eviction(monkeypatch):
    """With capacity m << distinct items: table size stays <= m, and for
    every tracked item true <= est <= true + err with err <= n/m (the
    Misra-Gries bound); every item with true count > n/m is tracked."""
    import collections

    # skewed stream: item i appears ~ 200/(i+1) times, 40 distinct,
    # round-robin interleaved so heavy items arrive spread out
    remaining = {i: 200 // (i + 1) for i in range(40)}
    stream = []
    while remaining:
        for i in sorted(remaining):
            stream.append(i)
            remaining[i] -= 1
            if not remaining[i]:
                del remaining[i]
    m = 8
    n = len(stream)
    true = collections.Counter(stream)
    out = _run_stream([stream[: n // 2], stream[n // 2 :]], m, monkeypatch)
    assert len(out) <= m
    est = {r.item: (r.est, r.err) for r in out.itertuples()}
    for it, (e, err) in est.items():
        assert true[it] <= e <= true[it] + err, (it, e, err, true[it])
        assert err <= n / m
    for it, c in true.items():
        if c > n // m:
            assert it in est, (it, c)


def test_space_saving_batched_equals_itemwise_reference(monkeypatch):
    """The vectorized batch-count update must equal the literal one-item-
    at-a-time algorithm when each batch group is a single item run (the
    regime where they are defined to coincide)."""
    stream = [0] * 50 + [1] * 30 + [2] * 20 + [3] * 5 + [4] * 3 + [5] * 2
    m = 4
    out = _run_stream([stream], m, monkeypatch)
    ref = _reference_space_saving(stream, m)
    got = {r.item: (r.est, r.err) for r in out.itertuples()}
    assert got == {k: v for k, v in ref.items()}


def test_space_saving_exact_when_capacity_sufficient(monkeypatch):
    import collections

    stream = [i % 10 for i in range(1000)]
    out = _run_stream([stream[:500], stream[500:]], 64, monkeypatch)
    true = collections.Counter(stream)
    got = {r.item: (r.est, r.err) for r in out.itertuples()}
    assert got == {k: (v, 0) for k, v in true.items()}
