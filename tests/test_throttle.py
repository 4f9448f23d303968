"""Per-key time-proximity duplicate suppression (stages/throttle.py).

The brute-force reference applies the LAG(ts) rule row-by-row in plain
Python; the operator must match it exactly under any block layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from abwcf_ray.stages.throttle import window_dedup


def _ref_window_dedup(df: pd.DataFrame, key_cols, ts_col, tb_col, gap):
    df = df.sort_values(key_cols + [ts_col, tb_col], kind="mergesort")
    kept = []
    prev: dict = {}
    for _, row in df.iterrows():
        k = tuple(row[c] for c in key_cols)
        ts = int(row[ts_col])
        if k not in prev or ts - prev[k] > gap:
            kept.append(int(row[tb_col]))
        prev[k] = ts  # LAG semantics: previous ROW, kept or not
    return sorted(kept)


def _events_df(seed: int, n: int):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "ts_us": rng.integers(0, 5_000, n).astype(np.int64),
        }
    )


def test_window_dedup_matches_bruteforce(ray_session):
    df = _events_df(7, 400)
    for blocks in (1, 5):
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        out = window_dedup(
            ds.repartition(blocks),
            key_cols=["user_id", "event_type"],
            ts_col="ts_us",
            tiebreak_col="event_id",
            gap=300,
            partitions=4,
        ).to_pandas()
        ref = _ref_window_dedup(
            df, ["user_id", "event_type"], "ts_us", "event_id", 300
        )
        assert sorted(out["event_id"].tolist()) == ref
        # schema passthrough: all input columns survive
        assert set(out.columns) == set(df.columns)


def test_window_dedup_edge_semantics(ray_session):
    # equal ts -> second suppressed; gap EXACTLY equal -> suppressed
    # (strict >); gap+1 -> kept; LAG is previous ROW not previous KEPT.
    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "user_id": np.zeros(6, np.int64),
            "event_type": ["a"] * 6,
            # 0: keep; 0 dup: drop; 100 (== gap): drop; 201: keep
            # (vs prev row 100: diff 101 > 100); 250: drop; 351: keep
            "ts_us": np.array([0, 0, 100, 201, 250, 351], np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = window_dedup(
        ds,
        key_cols=["user_id", "event_type"],
        ts_col="ts_us",
        tiebreak_col="event_id",
        gap=100,
        partitions=2,
    ).to_pandas()
    assert sorted(out["event_id"].tolist()) == [0, 3, 5]
