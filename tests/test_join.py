"""Generic hash equi-join (stages/join.py): pandas-merge parity across
both regimes, duplicate-key multiplicity, left join, string keys, empty
sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _frames(seed: int):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, size=500).astype(np.int64),
            "lv": np.arange(500, dtype=np.int64),
        }
    )
    # duplicate keys on the right too -> row multiplication
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 60, size=120).astype(np.int64),
            "rv": np.arange(120, dtype=np.int64) * 10,
        }
    )
    return left, right


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("broadcast_max_rows", [1_000_000, 0])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_equi_join_matches_pandas(ray_session, broadcast_max_rows, how):
    import ray.data as rd

    from abwcf_ray.stages.join import equi_join

    left, right = _frames(3)
    got = equi_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        on="k",
        how=how,
        broadcast_max_rows=broadcast_max_rows,
    ).to_pandas()
    exp = left.merge(right, on="k", how=how, sort=False)
    if how == "left":
        # unmatched rows carry nulls; compare with nullable dtype
        got["rv"] = got["rv"].astype("float64")
        exp["rv"] = exp["rv"].astype("float64")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


@pytest.mark.parametrize("broadcast_max_rows", [1_000_000, 0])
def test_equi_join_string_keys_and_collision_suffix(ray_session, broadcast_max_rows):
    import ray.data as rd

    from abwcf_ray.stages.join import equi_join

    left = pd.DataFrame({"k": ["a", "b", "b", "c"], "v": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": ["b", "c", "c", "x"], "v": [10, 20, 30, 40]})
    got = equi_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="k",
        broadcast_max_rows=broadcast_max_rows,
    ).to_pandas()
    exp = left.merge(right, on="k", how="inner", suffixes=("", "_r"), sort=False)
    got["v"] = got["v"].astype(np.int64)
    got["v_r"] = got["v_r"].astype(np.int64)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_equi_join_empty_right(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.join import equi_join

    left = pd.DataFrame({"k": np.array([1, 2], np.int64), "v": [1, 2]})
    right = pd.DataFrame({"k": np.array([], np.int64), "rv": np.array([], np.int64)})
    got = equi_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k"
    ).to_pandas()
    assert len(got) == 0
