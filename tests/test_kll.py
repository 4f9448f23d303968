"""Quantile compactor sketch (stages/kll.py): degenerate-capacity
exactness, rank-error bounds under compaction, merge behavior."""

from __future__ import annotations

import numpy as np
import pandas as pd

from abwcf_ray.stages.kll import _Sketch, kll_quantiles

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _exact_disc(v: np.ndarray, qs) -> list[int]:
    s = np.sort(v)
    return [int(s[max(1, int(np.ceil(q * len(s)))) - 1]) for q in qs]


def test_degenerate_capacity_is_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    v = rng.integers(-(10**12), 10**12, 5000).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(7)
    got = kll_quantiles(ds, col="x", qs=QS, k=100_000)
    assert got["value"].tolist() == _exact_disc(v, QS)


def test_rank_error_bound_under_compaction():
    rng = np.random.default_rng(11)
    n, k = 200_000, 256
    v = rng.integers(0, 10**9, n).astype(np.int64)
    s = _Sketch(k)
    for chunk in np.array_split(v, 40):
        s.add(chunk)
    sv = np.sort(v)
    got = s.quantiles(QS)["value"].to_numpy()
    for q, g in zip(QS, got):
        true_rank = np.searchsorted(sv, g, side="right")
        err = abs(true_rank - q * n) / n
        # deterministic alternating compaction: observed max ~1.5% at
        # n/k ~ 800; assert a 3x margin
        assert err < 0.05, (q, err)


def test_merge_matches_single_stream():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 10**6, 50_000).astype(np.int64)
    # merged sketches stay within the same rank-error envelope
    a, b = _Sketch(512), _Sketch(512)
    a.add(v[:30_000])
    b.add(v[30_000:])
    a.merge(b)
    assert a.n == len(v)
    sv = np.sort(v)
    for q, g in zip(QS, a.quantiles(QS)["value"].to_numpy()):
        err = abs(np.searchsorted(sv, g, side="right") - q * len(v)) / len(v)
        assert err < 0.05, (q, err)


def test_weights_conserved():
    rng = np.random.default_rng(9)
    s = _Sketch(64)
    v = rng.integers(0, 1000, 10_000).astype(np.int64)
    s.add(v)
    total = sum(len(lv) * (1 << i) for i, lv in enumerate(s.levels))
    assert total == len(v)  # every compaction halves count, doubles weight
    assert all(len(lv) <= 64 for lv in s.levels)


def test_empty_and_tiny(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"x": np.array([42], np.int64)}))
    got = kll_quantiles(ds, col="x", qs=[0.5], k=16)
    assert got["value"].tolist() == [42]
