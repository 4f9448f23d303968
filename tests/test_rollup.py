"""ROLLUP aggregation (stages/rollup.py): brute-force parity and layout
invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd

from abwcf_ray.stages.rollup import rollup_counts


def _frame(n=300, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "a": rng.choice(["en", "de", "fr"], n),
            "b": rng.choice(["web", "news", "wiki", "code"], n),
            "v": rng.integers(-50, 200, n).astype(np.int64),
        }
    )


def _brute(df):
    rows = []
    for depth in (2, 1, 0):
        keep = ["a", "b"][:depth]
        if keep:
            g = df.groupby(keep, as_index=False).agg(
                count=("v", "size"), sum_v=("v", "sum")
            )
        else:
            g = pd.DataFrame(
                [{"count": len(df), "sum_v": int(df["v"].sum())}]
            )
        for c in ["a", "b"][depth:]:
            g[c] = "*"
        g["level"] = np.int64(depth)
        rows.append(g[["a", "b", "count", "sum_v", "level"]])
    out = pd.concat(rows, ignore_index=True)
    out["count"] = out["count"].astype(np.int64)
    out["sum_v"] = out["sum_v"].astype(np.int64)
    return out.sort_values(["a", "b", "count"]).reset_index(drop=True)


def test_matches_brute_force(ray_session):
    import ray.data as rd

    df = _frame()
    got = rollup_counts(
        rd.from_pandas(df).repartition(6), group_cols=["a", "b"], sum_col="v"
    )
    got = got.sort_values(["a", "b", "count"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["a", "b", "count", "sum_v", "level"]], _brute(df)
    )


def test_layout_invariance(ray_session):
    import ray.data as rd

    df = _frame(seed=11)
    outs = [
        rollup_counts(
            rd.from_pandas(df).repartition(p),
            group_cols=["a", "b"],
            sum_col="v",
            merge_partitions=m,
        ).reset_index(drop=True)
        for p, m in ((1, 4), (9, 64))
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_single_group_col_count_only(ray_session):
    import ray.data as rd

    df = _frame(seed=3)
    got = rollup_counts(rd.from_pandas(df), group_cols=["a"])
    assert set(got["level"]) == {0, 1}
    total = got.loc[got["level"] == 0, "count"].iloc[0]
    assert total == len(df)
    per = got[got["level"] == 1]
    assert per["count"].sum() == len(df)
    exp = df.groupby("a").size()
    for _, r in per.iterrows():
        assert r["count"] == exp[r["a"]]


def _brute_cube(df):
    from itertools import compress, product

    rows = []
    for mask in range(4):
        keep = list(compress(["a", "b"], [not (mask & 2), not (mask & 1)]))
        if keep:
            g = df.groupby(keep, as_index=False).agg(
                count=("v", "size"), sum_v=("v", "sum")
            )
        else:
            g = pd.DataFrame([{"count": len(df), "sum_v": int(df["v"].sum())}])
        for c in ("a", "b"):
            if c not in keep:
                g[c] = "*"
        g["grouping"] = np.int64(mask)
        rows.append(g[["a", "b", "count", "sum_v", "grouping"]])
    out = pd.concat(rows, ignore_index=True)
    out["count"] = out["count"].astype(np.int64)
    out["sum_v"] = out["sum_v"].astype(np.int64)
    return out.sort_values(["grouping", "a", "b"]).reset_index(drop=True)


def test_cube_matches_brute_force(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.rollup import cube_counts

    df = _frame(seed=7)
    got = cube_counts(
        rd.from_pandas(df).repartition(6), group_cols=["a", "b"], sum_col="v"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["a", "b", "count", "sum_v", "grouping"]], _brute_cube(df)
    )


def test_cube_layout_invariance(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.rollup import cube_counts

    df = _frame(seed=13)
    outs = [
        cube_counts(
            rd.from_pandas(df).repartition(p),
            group_cols=["a", "b"],
            sum_col="v",
            merge_partitions=m,
        ).reset_index(drop=True)
        for p, m in ((1, 4), (9, 64))
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
