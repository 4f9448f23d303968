"""Funnel analysis (stages/funnel.py): brute-force subsequence parity,
layout invariance, depth-0 users, monotone counts."""

from __future__ import annotations

import numpy as np
import pandas as pd

from abwcf_ray.stages.funnel import funnel_counts, funnel_depths

STEPS = ["view", "click", "purchase"]


def _frame(n=1200, users=60, seed=31):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "ts": rng.integers(0, 300, n).astype(np.int64),  # heavy ties
            "event_type": rng.choice(
                ["view", "click", "purchase", "error", "signup"], n
            ),
        }
    )


def _brute_depths(df):
    out = {}
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        types = g["event_type"].tolist()
        d, it = 0, iter(types)
        for s in STEPS:
            if any(t == s for t in it):
                d += 1
            else:
                break
        out[uid] = d
    return out


def _run_depths(df, parts=7, m=8):
    import ray.data as rd

    out = funnel_depths(
        rd.from_pandas(df).repartition(parts),
        user_col="user_id",
        order_cols=["ts", "event_id"],
        type_col="event_type",
        steps=STEPS,
        partitions=m,
    ).to_pandas()
    return dict(zip(out["user_id"], out["depth"]))


def test_depths_match_brute_force(ray_session):
    df = _frame()
    assert _run_depths(df) == _brute_depths(df)


def test_counts_match_brute_force_and_are_monotone(ray_session):
    import ray.data as rd

    df = _frame(seed=47)
    got = funnel_counts(
        rd.from_pandas(df).repartition(5),
        user_col="user_id",
        order_cols=["ts", "event_id"],
        type_col="event_type",
        steps=STEPS,
    )
    bd = _brute_depths(df)
    exp = [sum(1 for d in bd.values() if d >= k) for k in (1, 2, 3)]
    assert got["n_users"].tolist() == exp
    assert (np.diff(got["n_users"].to_numpy()) <= 0).all()
    assert got["step_type"].tolist() == STEPS


def test_layout_invariance(ray_session):
    df = _frame(seed=5)
    assert _run_depths(df, parts=1, m=4) == _run_depths(df, parts=13, m=64)


def test_user_without_first_step_is_depth_zero(ray_session):
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "user_id": np.array([1, 1, 2, 2], np.int64),
            "ts": np.array([0, 1, 0, 1], np.int64),
            # user 2 clicks then purchases but never views -> depth 0
            "event_type": ["view", "click", "click", "purchase"],
        }
    )
    d = _run_depths(df, parts=1, m=2)
    assert d == {1: 2, 2: 0}


def test_order_matters_not_presence(ray_session):
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "user_id": np.zeros(3, np.int64),
            "ts": np.array([0, 1, 2], np.int64),
            # purchase BEFORE click: subsequence view->click stops at 2
            "event_type": ["purchase", "view", "click"],
        }
    )
    assert _run_depths(df, parts=1, m=2) == {0: 2}
