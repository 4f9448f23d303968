"""Per-group distinct counting (stages/distinct.py): exact brute-force
parity, HLL error bound per group, layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd

from abwcf_ray.stages.distinct import group_distinct_count, group_distinct_hll


def _pairs(n=2000, groups=7, items=300, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": ("grp-" + pd.Series(rng.integers(0, groups, n)).astype(str)),
            "w": ("item-" + pd.Series(rng.integers(0, items, n)).astype(str)),
        }
    )


def test_exact_matches_brute_force(ray_session):
    import ray.data as rd

    df = _pairs()
    got = (
        group_distinct_count(
            rd.from_pandas(df).repartition(5), group_col="g", item_col="w"
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("g")["w"].nunique().rename("distinct").reset_index()
    )
    exp["distinct"] = exp["distinct"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_exact_int_items_layout_invariance(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 1000).astype(np.int64),
            "w": rng.integers(0, 80, 1000).astype(np.int64),
        }
    )
    outs = [
        group_distinct_count(
            rd.from_pandas(df).repartition(p), group_col="g", item_col="w",
            partitions=m,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
        for p, m in ((1, 8), (13, 64))
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    exp = df.groupby("g")["w"].nunique()
    for _, r in outs[0].iterrows():
        assert r["distinct"] == exp[r["g"]]


def test_hll_within_error_bound(ray_session):
    import ray.data as rd

    # distinct cardinality per group varies 50..~1500; p=12 -> sigma ~1.6%
    rng = np.random.default_rng(7)
    frames = []
    for gi, card in enumerate([50, 300, 1500]):
        n = card * 4
        frames.append(
            pd.DataFrame(
                {
                    "g": f"g{gi}",
                    "w": "w" + pd.Series(
                        rng.integers(0, card, n)
                    ).astype(str) + f"-{gi}",
                }
            )
        )
    df = pd.concat(frames, ignore_index=True)
    got = (
        group_distinct_hll(
            rd.from_pandas(df).repartition(4), group_col="g", item_col="w", p=12
        )
        .to_pandas()
        .set_index("g")["distinct_est"]
    )
    exp = df.groupby("g")["w"].nunique()
    for g in exp.index:
        rel = abs(got[g] - exp[g]) / exp[g]
        assert rel < 0.10, (g, got[g], exp[g])  # ~6 sigma at p=12


def test_hll_merge_layout_invariance(ray_session):
    import ray.data as rd

    df = _pairs(seed=23)
    a = group_distinct_hll(
        rd.from_pandas(df).repartition(1), group_col="g", item_col="w", p=10
    ).to_pandas().sort_values("g").reset_index(drop=True)
    b = group_distinct_hll(
        rd.from_pandas(df).repartition(9), group_col="g", item_col="w", p=10
    ).to_pandas().sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
