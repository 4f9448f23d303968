"""Windowed-aggregate tests: the skew-safe two-stage session implementation
must equal a naive single-process session computation, including under a
hot key owning half the events (round-1 VERDICT item 7)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

GAP_US = 1_000_000  # 1 s


def _naive_sessions(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    out = []
    for k, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "value"], kind="mergesort")
        ts = g["ts_us"].to_numpy()
        brk = np.ones(len(ts), dtype=bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(brk) - 1
        agg = (
            pd.DataFrame({"sid": sid, "ts": ts, "v": g["value"].to_numpy()})
            .groupby("sid")
            .agg(session_start=("ts", "min"), n_events=("v", "size"), sum_value=("v", "sum"))
            .reset_index()
        )
        agg["user_id"] = k
        agg["session_id"] = agg.index.to_numpy()
        out.append(agg)
    res = pd.concat(out, ignore_index=True)
    res["sum_value"] = res["sum_value"].round(4)
    res["n_events"] = res["n_events"].astype(np.int64)
    return res[["user_id", "session_id", "session_start", "n_events", "sum_value"]]


def _events_table(n: int, hot_frac: float, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_frac)
    uid = np.concatenate(
        [np.zeros(n_hot, dtype=np.int64), rng.integers(1, 40, n - n_hot)]
    )
    # ts pattern that produces multi-bucket sessions AND isolated events
    ts = rng.integers(0, 400 * GAP_US, n).astype(np.int64)
    dense = rng.random(n) < 0.5
    ts[dense] = (ts[dense] // (50 * GAP_US)) * (50 * GAP_US) + rng.integers(
        0, GAP_US // 2, dense.sum()
    ) * np.arange(1, dense.sum() + 1) % (40 * GAP_US)
    val = rng.random(n).round(3)
    return pd.DataFrame({"user_id": uid, "ts_us": ts, "value": val})


@pytest.mark.parametrize("hot_frac", [0.0, 0.5])
def test_session_windows_match_naive(ray_session, hot_frac):
    import ray.data as rd

    from abwcf_ray.stages.windows import session_windows

    df = _events_table(4000, hot_frac, seed=9)
    t = pa.table(
        {
            "user_id": pa.array(df["user_id"], pa.int64()),
            "ts": pa.array(df["ts_us"], pa.timestamp("us")),
            "value": pa.array(df["value"], pa.float64()),
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    got = (
        session_windows(ds, key="user_id", ts_col="ts", value_col="value", gap_us=GAP_US)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    exp = (
        _naive_sessions(df, GAP_US)
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"session_start": "int64"}), exp.astype({"session_start": "int64"})
    )


def test_session_windows_cross_bucket_stitching(ray_session):
    """A session spanning several coarse buckets must come back as ONE
    session (the merge chain), and sessions split by exactly > gap must
    stay split."""
    import ray.data as rd

    from abwcf_ray.stages.windows import session_windows

    # events every 0.9 s for 200 s -> one long session crossing many
    # 32-gap coarse buckets; then a gap of exactly gap+1 -> second session
    ts1 = np.arange(0, 200_000_000, 900_000, dtype=np.int64)
    ts2 = ts1[-1] + GAP_US + 1 + np.arange(3, dtype=np.int64) * 100
    ts = np.concatenate([ts1, ts2])
    t = pa.table(
        {
            "user_id": pa.array(np.full(len(ts), 7), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(np.ones(len(ts)), pa.float64()),
        }
    )
    ds = rd.from_arrow(t).repartition(6)
    got = (
        session_windows(ds, key="user_id", ts_col="ts", value_col="value", gap_us=GAP_US)
        .to_pandas()
        .sort_values("session_id")
        .reset_index(drop=True)
    )
    assert len(got) == 2
    assert got.loc[0, "n_events"] == len(ts1)
    assert got.loc[1, "n_events"] == 3
    assert got.loc[0, "session_start"] == 0


def test_windows_accept_string_keys(ray_session):
    import pandas as pd
    import ray.data as rd

    from abwcf_ray.stages.windows import sliding_windows, tumbling_windows

    df = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "a"],
            "ts": np.array([10, 20, 15, 4000, 4500], np.int64),
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    ds = rd.from_pandas(df).repartition(2)
    tm = tumbling_windows(ds, key="k", ts_col="ts", value_col="v", width_us=1000)
    out = tm.to_pandas().sort_values(["k", "window_id"]).reset_index(drop=True)
    assert out[out["k"] == "a"]["n_events"].tolist() == [2, 1]
    sl = sliding_windows(ds, key="k", ts_col="ts", value_col="v",
                         width_us=2000, slide_us=1000)
    assert sl.count() > 0
