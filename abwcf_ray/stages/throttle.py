"""Per-key time-proximity duplicate suppression ("throttle dedup"):
drop a row when the SAME key fired within the previous ``gap`` time
units — the streaming duplicate-event filter (double-click suppression,
re-fetch damping, retry-storm collapse; the reference's re-enqueue
dedup, UrlDeduplicator.scala:13, is the gap = ∞ special case over the
crawl frontier).

Distributed shape: the keyed-partition exchange (winfun.py) — ONE
hash(key) exchange lands every key's rows whole in one shard, then the
filter is fully vectorized per shard:

1. one lexsort by (key, ts, tiebreak),
2. keep a row iff it starts its key run OR its gap to the IMMEDIATELY
   PREVIOUS row of the same key (kept or not) exceeds ``gap`` — the
   exact LAG(ts) window semantics, so the SQL oracle is one LAG +
   filter and hash-matches bit-for-bit.

All arithmetic is int64 (microsecond epochs). Scale contract: one key's
rows must fit in its shard (the PARTITION BY contract); size
``partitions`` to cluster width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.winfun import _pkey_of


def window_dedup(
    ds,
    *,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    gap: int,
    partitions: int = 64,
):
    """Dataset -> Dataset with the same columns, keeping a row iff no
    row with the same ``key_cols`` has ``ts`` within the previous
    ``gap`` units (strict: a gap of exactly ``gap`` is suppressed, i.e.
    keep iff ts - prev_ts > gap). Rows tie-broken by ``tiebreak_col``
    (must be a unique int64, e.g. the event id); equal-ts duplicates
    are suppressed after the first."""

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_pkey",
            pa.array(_pkey_of(t.column(key_cols[0]), partitions), pa.int64()),
        )

    def filt(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_pkey")
        n = len(g)
        if n == 0:
            return g
        codes = np.zeros(n, np.int64)
        for kc in key_cols:
            c, u = pd.factorize(g[kc].to_numpy(), use_na_sentinel=False)
            codes = codes * np.int64(len(u) + 1) + c
        ts = g[ts_col].to_numpy(np.int64)
        tb = g[tiebreak_col].to_numpy(np.int64)
        order = np.lexsort((tb, ts, codes))
        cs, tss = codes[order], ts[order]
        keep = np.empty(n, bool)
        keep[0] = True
        keep[1:] = (cs[1:] != cs[:-1]) | (tss[1:] - tss[:-1] > gap)
        return g.iloc[np.sort(order[keep])]

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(filt, batch_format="pandas")
    )
