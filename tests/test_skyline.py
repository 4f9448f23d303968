"""Distributed 2-D skyline (stages/skyline.py) vs an O(n^2) brute-force
dominance check, including duplicate surviving points and layout
invariance (the algebraic local-prune/merge decomposition must not change
the result)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from abwcf_ray.stages.skyline import _skyline_mask, skyline2d


def _brute_mask(x, y):
    n = len(x)
    keep = np.ones(n, bool)
    for i in range(n):
        dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        keep[i] = not dom.any()
    return keep


def test_skyline_mask_matches_brute_force():
    rng = np.random.default_rng(5)
    for trial in range(20):
        n = int(rng.integers(1, 200))
        # small domain forces ties AND exact duplicate points
        x = rng.integers(0, 12, n).astype(np.int64)
        y = rng.integers(0, 12, n).astype(np.int64)
        np.testing.assert_array_equal(
            _skyline_mask(x, y), _brute_mask(x, y), err_msg=f"trial {trial}"
        )


def test_skyline_mask_duplicates_all_survive():
    x = np.array([5, 5, 3], np.int64)
    y = np.array([7, 7, 9], np.int64)
    # (5,7) twice: neither dominates the other; (3,9) is incomparable
    np.testing.assert_array_equal(_skyline_mask(x, y), [True, True, True])


def test_skyline2d_layout_invariance(ray_session):
    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "x": rng.integers(0, 1000, n).astype(np.int64),
            "y": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    ref_ids = sorted(
        df.loc[_brute_mask(df["x"].to_numpy(), df["y"].to_numpy()), "rid"].tolist()
    )
    for blocks in (1, 3, 17):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
        out = skyline2d(ds, x_col="x", y_col="y").to_pandas()
        assert sorted(out["rid"].tolist()) == ref_ids
