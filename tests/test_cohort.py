"""Cohort retention matrix (stages/cohort.py) vs a pandas brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from abwcf_ray.stages.cohort import cohort_retention


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    a = df.drop_duplicates()
    c = a.groupby("user_id", as_index=False)["day"].min().rename(
        columns={"day": "cohort"}
    )
    j = a.merge(c, on="user_id")
    j["offset"] = j["day"] - j["cohort"]
    out = (
        j.groupby(["cohort", "offset"], as_index=False)["user_id"]
        .nunique()
        .rename(columns={"user_id": "n_users"})
        .sort_values(["cohort", "offset"])
        .reset_index(drop=True)
    )
    return out.astype(np.int64)


def test_cohort_retention_bruteforce(ray_session):
    rng = np.random.default_rng(21)
    n = 500
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "day": rng.integers(0, 12, n).astype(np.int64),
        }
    )
    for blocks in (1, 6):
        out = (
            cohort_retention(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                user_col="user_id",
                bucket_col="day",
                partitions=4,
            )
            .to_pandas()
            .sort_values(["cohort", "offset"])
            .reset_index(drop=True)
            .astype(np.int64)
        )
        pd.testing.assert_frame_equal(out, _brute(df))


def test_cohort_retention_offset_zero_is_cohort_size(ray_session):
    # every user is active in their cohort bucket by definition
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2, 3, 3, 3], np.int64),
            "day": np.array([0, 3, 1, 0, 0, 5], np.int64),
        }
    )
    out = (
        cohort_retention(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            user_col="user_id",
            bucket_col="day",
            partitions=2,
        )
        .to_pandas()
        .set_index(["cohort", "offset"])["n_users"]
    )
    assert out.loc[(0, 0)] == 2  # users 1 and 3
    assert out.loc[(1, 0)] == 1  # user 2
    assert out.loc[(0, 3)] == 1  # user 1 returns day 3
    assert out.loc[(0, 5)] == 1  # user 3 returns day 5
