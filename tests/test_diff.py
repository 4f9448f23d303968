"""Snapshot diff (stages/diff.py): brute-force parity, null-safe
compares, O(churn) output, layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _brute(old: pd.DataFrame, new: pd.DataFrame, key, cols):
    m = old.merge(
        new, on=key, how="outer", suffixes=("_o", "_n"), indicator=True
    )
    rows = []
    for _, r in m.iterrows():
        if r["_merge"] == "right_only":
            change = "added"
        elif r["_merge"] == "left_only":
            change = "removed"
        else:
            diff = any(
                not (
                    (pd.isna(r[f"{c}_o"]) and pd.isna(r[f"{c}_n"]))
                    or r[f"{c}_o"] == r[f"{c}_n"]
                )
                for c in cols
            )
            if not diff:
                continue
            change = "changed"
        rows.append(
            {key: r[key], "change": change}
            | {f"old_{c}": r[f"{c}_o"] for c in cols}
            | {f"new_{c}": r[f"{c}_n"] for c in cols}
        )
    return (
        pd.DataFrame(rows)
        .sort_values(key)
        .reset_index(drop=True)
    )


def _mkframes(seed=5, n=300):
    rng = np.random.default_rng(seed)
    base = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64),
            "s": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(0, 50, n).astype(np.int64),
        }
    )
    old = base[base.k % 7 != 0].copy()
    new = base[base.k % 5 != 0].copy()
    new.loc[new.k % 3 == 0, "v"] += 100
    new.loc[new.k % 11 == 0, "s"] = "zz"
    return old, new


def test_snapshot_diff_matches_bruteforce(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.diff import snapshot_diff

    old, new = _mkframes()
    got = (
        snapshot_diff(
            rd.from_pandas(old).repartition(4),
            rd.from_pandas(new).repartition(3),
            key="k",
            compare_cols=["s", "v"],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = _brute(old, new, "k", ["s", "v"])
    assert list(got["k"]) == list(want["k"])
    assert list(got["change"]) == list(want["change"])
    for c in ("old_s", "new_s"):
        assert [
            None if x is None or (isinstance(x, float) and np.isnan(x)) else x
            for x in got[c]
        ] == [None if pd.isna(x) else x for x in want[c]]
    for c in ("old_v", "new_v"):
        assert got[c].fillna(-1).astype("int64").tolist() == want[c].fillna(
            -1
        ).astype("int64").tolist()


def test_snapshot_diff_unchanged_tables_empty(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.diff import snapshot_diff

    old, _ = _mkframes()
    out = snapshot_diff(
        rd.from_pandas(old),
        rd.from_pandas(old.copy()),
        key="k",
        compare_cols=["s", "v"],
    ).to_pandas()
    assert len(out) == 0  # O(churn): identical snapshots emit nothing


def test_snapshot_diff_null_value_compares(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.diff import snapshot_diff

    old = pd.DataFrame(
        {"k": [1, 2, 3], "s": [None, "x", None], "v": [1, 2, 3]}
    )
    new = pd.DataFrame(
        {"k": [1, 2, 3], "s": [None, None, "y"], "v": [1, 2, 3]}
    )
    out = (
        snapshot_diff(
            rd.from_pandas(old),
            rd.from_pandas(new),
            key="k",
            compare_cols=["s", "v"],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=1: null == null -> unchanged (dropped); k=2,3: one-sided null differs
    assert list(out["k"]) == [2, 3]
    assert set(out["change"]) == {"changed"}
