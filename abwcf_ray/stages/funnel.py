"""Funnel analysis: ordered multi-step conversion over an event stream.

The product-analytics staple: how many users performed step 1, then step
2 AFTER it, then step 3 after that — i.e. does the ordered step sequence
embed as a SUBSEQUENCE of the user's event history. Greedy
earliest-match is optimal for subsequence tests, so per-user depth is
exact and deterministic.

Distributed shape: ONE hash(user)-keyed exchange (the winfun idiom —
each user's history lands whole in one shard; exchange O(events), once),
then a per-shard vectorized scan: sort by (user, order_cols), and per
funnel STEP (a handful, not per event) one boolean mask + one
``np.minimum.at`` segmented-min picks each still-alive user's earliest
usable match. No per-user Python loop; the step loop is O(len(steps))
vectorized passes.

The summary (users reaching >= each step) is tiny: per-shard depth rows
aggregate to a |steps|-row table on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import keyed_hash_agg

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def funnel_depths(
    ds,
    *,
    user_col: str,
    order_cols: list[str],
    type_col: str,
    steps: list[str],
    partitions: int = 64,
):
    """Per-user funnel depth: the Dataset (user_col, depth) where depth =
    the longest prefix of ``steps`` embeddable, in order, in the user's
    events sorted by ``order_cols`` (must be a total order per user —
    append a unique id). Users with no step-1 event still appear, at
    depth 0."""

    def key_of(b: pa.Table) -> np.ndarray:
        return (
            b.column(user_col).to_numpy(zero_copy_only=False).view(np.uint64)
            * _GOLD
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    user_col: pd.Series([], dtype=np.int64),
                    "depth": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values([user_col, *order_cols], kind="mergesort")
        users, codes = np.unique(g[user_col].to_numpy(), return_inverse=True)
        types = g[type_col].to_numpy()
        n, m = len(g), len(users)
        pos = np.arange(n, dtype=np.int64)
        big = np.iinfo(np.int64).max
        cur = np.full(m, -1, np.int64)  # pos of the user's last matched step
        alive = np.ones(m, bool)
        depth = np.zeros(m, np.int64)
        for j, s in enumerate(steps):
            cand = (types == s) & alive[codes] & (pos > cur[codes])
            nxt = np.full(m, big, np.int64)
            np.minimum.at(nxt, codes[cand], pos[cand])
            alive &= nxt < big
            if not alive.any():
                break
            cur = np.where(alive, nxt, cur)
            depth[alive] = j + 1
        return pd.DataFrame({user_col: users, "depth": depth})

    return keyed_hash_agg(ds, key_of, scan, partitions=partitions)


def funnel_counts(
    ds,
    *,
    user_col: str,
    order_cols: list[str],
    type_col: str,
    steps: list[str],
    partitions: int = 64,
) -> pd.DataFrame:
    """The funnel summary: one row per step — (step 1-based, step_type,
    n_users with depth >= step). Exact int64; |steps| rows total."""
    depths = funnel_depths(
        ds,
        user_col=user_col,
        order_cols=order_cols,
        type_col=type_col,
        steps=steps,
        partitions=partitions,
    )

    def hist(t: pa.Table) -> pa.Table:
        d = t.column("depth").to_numpy(zero_copy_only=False)
        c = np.bincount(d, minlength=len(steps) + 1).astype(np.int64)
        return pa.table(
            {
                "depth": pa.array(np.arange(len(c), dtype=np.int64)),
                "n": pa.array(c),
            }
        )

    parts = depths.map_batches(hist, batch_format="pyarrow").to_pandas()
    per_depth = np.zeros(len(steps) + 1, np.int64)
    agg = parts.groupby("depth")["n"].sum()
    per_depth[agg.index.to_numpy()] = agg.to_numpy()
    reaching = per_depth[::-1].cumsum()[::-1]  # users with depth >= k
    return pd.DataFrame(
        {
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            "step_type": steps,
            "n_users": reaching[1:],
        }
    )
