"""Per-key interval union — merge overlapping [start, end) intervals and
report total covered span + merged-block count per key (the
"islands and gaps" primitive: user activity coverage, crawl-window
occupancy, host politeness-slot accounting).

Distributed shape: the keyed-partition exchange (see winfun.py) — ONE
hash(key) exchange lands every key's intervals whole in one shard, then
the merge is fully vectorized per shard:

1. one lexsort by (key, start, end),
2. running max of `end` within each key (one C-level grouped cummax),
3. a new merged block starts where `start` exceeds the running max of
   every EARLIER interval's end (strict >: touching intervals merge),
4. block span = (max end in block) − (block start); per-key totals via
   one bincount each.

All arithmetic is int64 (microsecond epochs) — the SQL oracle
(windowed MAX ... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING, the
standard gaps-and-islands query) hash-matches exactly.

Scale contract: one key's intervals must fit in its shard (the
PARTITION BY contract); size ``partitions`` to cluster width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.winfun import _pkey_of


def interval_union(
    ds,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
    partitions: int = 64,
):
    """Dataset of (key, start:int64, end:int64) -> Dataset of
    (key_col, n_blocks:int64, covered:int64): merged-interval count and
    total covered length per key. Intervals with end <= start contribute
    their (possibly zero/negative) span exactly as the SQL mirror does —
    callers should pre-filter if they want them gone."""

    def tag(t: pa.Table) -> pa.Table:
        return t.select([key_col, start_col, end_col]).append_column(
            "_pkey",
            pa.array(_pkey_of(t.column(key_col), partitions), pa.int64()),
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_pkey")
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    key_col: g[key_col],
                    "n_blocks": pd.Series([], dtype=np.int64),
                    "covered": pd.Series([], dtype=np.int64),
                }
            )
        codes, uniq = pd.factorize(g[key_col].to_numpy(), use_na_sentinel=False)
        s = g[start_col].to_numpy(np.int64)
        e = g[end_col].to_numpy(np.int64)
        order = np.lexsort((e, s, codes))
        cs, ss, es = codes[order], s[order], e[order]
        new = np.empty(n, bool)
        new[0] = True
        np.not_equal(cs[1:], cs[:-1], out=new[1:])
        runmax = pd.Series(es).groupby(cs).cummax().to_numpy(np.int64)
        prior = np.empty(n, np.int64)
        prior[1:] = runmax[:-1]
        newblock = new | (ss > prior)
        bid = np.cumsum(newblock) - 1
        nb = int(bid[-1]) + 1
        bstart = ss[newblock]
        bend = np.maximum.reduceat(es, np.flatnonzero(newblock))
        bkey = cs[newblock]
        span = bend - bstart
        n_blocks = np.bincount(bkey, minlength=len(uniq)).astype(np.int64)
        covered = np.zeros(len(uniq), np.int64)
        np.add.at(covered, bkey, span)  # exact int64 (bincount weights are float)
        assert nb == int(n_blocks.sum())
        return pd.DataFrame(
            {key_col: uniq, "n_blocks": n_blocks, "covered": covered}
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )
