"""Global total-order rank (stages/rank.py): brute-force parity, ties,
descending, layout invariance, degenerate key domains."""

from __future__ import annotations

import numpy as np
import pandas as pd

from abwcf_ray.stages.rank import global_rank


def _frame(n=400, lo=0, hi=20, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": rng.permutation(n).astype(np.int64),
            "k": rng.integers(lo, hi, n).astype(np.int64),
        }
    )


def _brute(df, descending=False):
    out = df.sort_values(
        ["k", "id"], ascending=[not descending, True], kind="mergesort"
    ).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.sort_values("id").reset_index(drop=True)


def _run(df, ray_parts=5, **kw):
    import ray.data as rd

    got = global_rank(
        rd.from_pandas(df).repartition(ray_parts), key_col="k", id_col="id", **kw
    ).to_pandas()
    return got.sort_values("id").reset_index(drop=True)


def test_matches_brute_force_heavy_ties(ray_session):
    df = _frame()
    got = _run(df, partitions=8)
    pd.testing.assert_frame_equal(got[["id", "k", "rank"]],
                                  _brute(df)[["id", "k", "rank"]])


def test_descending(ray_session):
    df = _frame(seed=13)
    got = _run(df, partitions=8, descending=True)
    exp = _brute(df, descending=True)
    pd.testing.assert_frame_equal(got[["id", "k", "rank"]],
                                  exp[["id", "k", "rank"]])


def test_layout_invariance(ray_session):
    df = _frame(seed=21, n=300)
    a = _run(df, ray_parts=1, partitions=4)
    b = _run(df, ray_parts=11, partitions=16)
    pd.testing.assert_frame_equal(a, b)


def test_single_key_domain(ray_session):
    # every row the same key: rank must be pure id order, one shard holds all
    df = pd.DataFrame(
        {"id": np.arange(50, dtype=np.int64)[::-1].copy(),
         "k": np.zeros(50, np.int64)}
    )
    got = _run(df, partitions=8)
    exp = _brute(df)
    pd.testing.assert_frame_equal(got[["id", "rank"]], exp[["id", "rank"]])


def test_more_partitions_than_distinct_keys(ray_session):
    df = _frame(n=100, lo=0, hi=3, seed=2)
    got = _run(df, partitions=64)
    pd.testing.assert_frame_equal(got[["id", "k", "rank"]],
                                  _brute(df)[["id", "k", "rank"]])


def test_negative_keys(ray_session):
    df = _frame(n=200, lo=-50, hi=50, seed=4)
    got = _run(df, partitions=8)
    pd.testing.assert_frame_equal(got[["id", "k", "rank"]],
                                  _brute(df)[["id", "k", "rank"]])


def test_global_ntile_agg_matches_pandas(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from abwcf_ray.stages.rank import global_ntile_agg

    rng = np.random.default_rng(9)
    n = 503  # deliberately not divisible by the tile count
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 40, n).astype(np.int64),  # heavy ties
        }
    )
    out = (
        global_ntile_agg(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(5),
            key_col="v",
            id_col="id",
            tiles=10,
            partitions=8,
        )
        .to_pandas()
        .sort_values("tile")
        .reset_index(drop=True)
    )
    # reference: exact NTILE semantics over (v, id) order
    s = df.sort_values(["v", "id"], kind="mergesort").reset_index(drop=True)
    N, k = len(s), 10
    small, nbig = N // k, N % k
    cutoff = nbig * (small + 1)
    r0 = np.arange(N)
    tile = np.where(r0 < cutoff, r0 // (small + 1), nbig + (r0 - cutoff) // small) + 1
    s["tile"] = tile
    ref = (
        s.groupby("tile", as_index=False)
        .agg(n_rows=("v", "size"), sum_v=("v", "sum"))
        .astype(np.int64)
    )
    assert out["tile"].tolist() == ref["tile"].tolist()
    assert out["n_rows"].tolist() == ref["n_rows"].tolist()
    assert out["sum_v"].tolist() == ref["sum_v"].tolist()
    # equi-depth: first N%k tiles hold one extra row
    assert set(out["n_rows"]) == {small, small + 1}
