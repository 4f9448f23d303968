"""Interval union (stages/intervals.py): brute-force merge parity,
touching/nested/duplicate intervals, layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd

from abwcf_ray.stages.intervals import interval_union


def _brute(df):
    rows = []
    for k, sub in df.groupby("k"):
        iv = sorted(zip(sub["s"], sub["e"]))
        blocks = []
        for s, e in iv:
            if blocks and s <= blocks[-1][1]:
                blocks[-1][1] = max(blocks[-1][1], e)
            else:
                blocks.append([s, e])
        rows.append((k, len(blocks), sum(e - s for s, e in blocks)))
    out = pd.DataFrame(rows, columns=["k", "n_blocks", "covered"])
    out["n_blocks"] = out["n_blocks"].astype(np.int64)
    out["covered"] = out["covered"].astype(np.int64)
    return out.sort_values("k").reset_index(drop=True)


def _run(df, blocks=5, partitions=8):
    import ray.data as rd

    return (
        interval_union(
            rd.from_pandas(df).repartition(blocks),
            key_col="k",
            start_col="s",
            end_col="e",
            partitions=partitions,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )


def test_interval_union_matches_brute(ray_session):
    rng = np.random.default_rng(19)
    n = 800
    s = rng.integers(0, 10_000, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 15, n).astype(np.int64),
            "s": s,
            "e": s + rng.integers(0, 600, n).astype(np.int64),
        }
    )
    pd.testing.assert_frame_equal(_run(df), _brute(df))


def test_interval_union_touching_nested_duplicate(ray_session):
    # touching intervals merge (s == prior end), nested collapse,
    # exact duplicates count once
    df = pd.DataFrame(
        {
            "k": np.array([1, 1, 1, 1, 1, 2, 2], np.int64),
            "s": np.array([0, 10, 3, 3, 40, 5, 5], np.int64),
            "e": np.array([10, 20, 7, 7, 50, 9, 9], np.int64),
        }
    )
    out = _run(df, blocks=3)
    want = _brute(df)
    pd.testing.assert_frame_equal(out, want)
    assert want.loc[want["k"] == 1, "n_blocks"].iloc[0] == 2  # [0,20)+[40,50)
    assert want.loc[want["k"] == 1, "covered"].iloc[0] == 30


def test_interval_union_layout_invariant(ray_session):
    rng = np.random.default_rng(29)
    n = 300
    s = rng.integers(0, 2_000, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n).astype(np.int64),
            "s": s,
            "e": s + rng.integers(0, 80, n).astype(np.int64),
        }
    )
    pd.testing.assert_frame_equal(
        _run(df, blocks=1, partitions=2), _run(df, blocks=9, partitions=16)
    )
