"""PIVOT/UNPIVOT (stages/pivot.py): brute-force parity, other-bucket,
round-trip."""

from __future__ import annotations

import numpy as np
import pandas as pd

from abwcf_ray.stages.pivot import pivot_counts, unpivot

CATS = ["a", "b", "c"]


def _frame(n=1000, seed=3, extra=False):
    rng = np.random.default_rng(seed)
    pool = CATS + (["zz", "yy"] if extra else [])
    return pd.DataFrame(
        {
            "g": "u" + pd.Series(rng.integers(0, 20, n)).astype(str),
            "cat": rng.choice(pool, n),
        }
    )


def _brute(df, include_other=False):
    ct = pd.crosstab(df["g"], df["cat"])
    out = pd.DataFrame({"g": ct.index})
    for c in CATS:
        out[f"n_{c}"] = ct.get(c, pd.Series(0, index=ct.index)).to_numpy(np.int64)
    if include_other:
        extras = [c for c in ct.columns if c not in CATS]
        out["n_other"] = (
            ct[extras].sum(axis=1).to_numpy(np.int64) if extras else np.int64(0)
        )
    return out.sort_values("g").reset_index(drop=True)


def test_pivot_matches_brute_force(ray_session):
    import ray.data as rd

    df = _frame()
    got = (
        pivot_counts(
            rd.from_pandas(df).repartition(7), group_col="g",
            pivot_col="cat", categories=CATS,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _brute(df))


def test_pivot_other_bucket_and_drop(ray_session):
    import ray.data as rd

    df = _frame(extra=True, seed=9)
    with_other = (
        pivot_counts(
            rd.from_pandas(df).repartition(4), group_col="g",
            pivot_col="cat", categories=CATS, other_col="other",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(with_other, _brute(df, include_other=True))
    dropped = (
        pivot_counts(
            rd.from_pandas(df), group_col="g", pivot_col="cat",
            categories=CATS,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        dropped, _brute(df[df["cat"].isin(CATS)])
    )


def test_unpivot_round_trip(ray_session):
    import ray.data as rd

    df = _frame(seed=5)
    wide = pivot_counts(
        rd.from_pandas(df), group_col="g", pivot_col="cat", categories=CATS
    )
    long = (
        unpivot(
            wide, id_cols=["g"], value_cols=[f"n_{c}" for c in CATS],
            var_name="cat", value_name="n",
        )
        .to_pandas()
    )
    long["cat"] = long["cat"].str.removeprefix("n_")
    back = (
        long.pivot_table(index="g", columns="cat", values="n")
        .reset_index()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = _brute(df)
    for c in CATS:
        assert (back[c].to_numpy(np.int64) == exp[f"n_{c}"].to_numpy()).all()
