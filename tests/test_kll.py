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


def test_group_trimmed_mean_matches_brute(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.sketch import group_trimmed_mean

    rng = np.random.default_rng(17)
    n = 2000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(-100, 5000, n).astype(np.int64),
        }
    )
    got = (
        group_trimmed_mean(
            rd.from_pandas(df).repartition(6), group_col="g", col="v",
            q_lo=0.1, q_hi=0.9, merge_partitions=8,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    rows = []
    for gval, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        total = len(v)
        lo = v[max(1, int(np.ceil(0.1 * total))) - 1]
        hi = v[max(1, int(np.ceil(0.9 * total))) - 1]
        keep = v[(v >= lo) & (v <= hi)]
        rows.append(
            (gval, len(keep), int(keep.sum()),
             float(np.float64(int(keep.sum())) / np.float64(len(keep))))
        )
    want = pd.DataFrame(
        rows, columns=["g", "n_kept", "sum_kept", "trimmed_mean"]
    )
    want["n_kept"] = want["n_kept"].astype(np.int64)
    want["sum_kept"] = want["sum_kept"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_group_mad_matches_brute(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.sketch import group_mad

    rng = np.random.default_rng(41)
    n = 1200
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], n),
            "v": rng.integers(-50, 500, n).astype(np.int64),
        }
    )
    got = (
        group_mad(
            rd.from_pandas(df).repartition(7), group_col="g", col="v",
            merge_partitions=8,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )

    def disc_med(a):
        a = np.sort(a)
        return int(a[max(1, int(np.ceil(0.5 * len(a)))) - 1])

    for _, r in got.iterrows():
        v = df.loc[df["g"] == r["g"], "v"].to_numpy()
        med = disc_med(v)
        assert r["med"] == med
        assert r["mad"] == disc_med(np.abs(v - med))
