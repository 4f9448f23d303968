"""Interval merge (gaps-and-islands over ranges) — per-key overlapping
[start, end] intervals coalesced into maximal disjoint blocks, with the
per-key block count and total covered length.

This is the range flavor of the islands family (longest_streak covers
value runs, cohort_retention covers offset buckets): session-coverage
analysis ("how much wall-clock was this user active, counting overlaps
once"), crawl politeness-window coalescing, on-call shift dedup.

SQL shape:

    new block  <=>  start > MAX(end) OVER (PARTITION BY key
                                           ORDER BY start, end
                                           ROWS ... AND 1 PRECEDING)

Distributed shape (the funnel/winfun idiom): ONE hash(key)-keyed
exchange lands every interval of a key in the same shard (blocks never
cross shards because keys don't), then a per-shard vectorized scan:
mergesort by (key, start, end), per-key running max of ``end`` (one
pandas grouped cummax — no per-interval Python loop), break flags where
``start`` exceeds the previous running max, block ids from a cumsum of
the flags, and the per-block extents from one grouped min/max. Each
shard emits ONE row per key (n_blocks, covered), so the final merge is
bounded by the key domain, never the interval count.

Touching intervals (start == previous max end) MERGE — the closed-
interval convention, mirrored by the oracle's strict ``>`` break test.
All arithmetic is exact int64; no floats anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import keyed_hash_agg

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def interval_coverage(
    ds,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
    partitions: int = 64,
):
    """Per-key merged-interval summary: Dataset of
    (key_col, n_blocks:int64, covered:int64) where n_blocks is the
    number of maximal disjoint blocks after coalescing overlapping /
    touching intervals and covered = sum(block_end - block_start).

    Keys are int64 (the user/entity-id shape); start/end are int64 with
    start <= end per row (a zero-length interval contributes a block but
    no coverage unless merged into a longer one).
    """

    def key_of(b: pa.Table) -> np.ndarray:
        return (
            b.column(key_col).to_numpy(zero_copy_only=False).view(np.uint64)
            * _GOLD
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=np.int64),
                    "n_blocks": pd.Series([], dtype=np.int64),
                    "covered": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values([key_col, start_col, end_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        s = g[start_col].to_numpy(np.int64)
        e = g[end_col].to_numpy(np.int64)
        # running max of e within each key segment, shifted by one row:
        # prev_max[i] = max(e[j] for j < i in the same key), sentinel at
        # the first row of each key.
        prev_max = (
            pd.Series(e).groupby(keys, sort=False).cummax().to_numpy(np.int64)
        )
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = keys[1:] != keys[:-1]
        shifted = np.empty(len(g), np.int64)
        shifted[1:] = prev_max[:-1]
        brk = first | (s > shifted)
        block = np.cumsum(brk.astype(np.int64)) - 1
        blk = pd.DataFrame({"k": keys, "b": block, "s": s, "e": e}).groupby(
            ["k", "b"], as_index=False, sort=False
        ).agg(bs=("s", "min"), be=("e", "max"))
        out = blk.assign(length=blk["be"] - blk["bs"]).groupby(
            "k", as_index=False, sort=False
        ).agg(n_blocks=("b", "size"), covered=("length", "sum"))
        out = out.rename(columns={"k": key_col})
        out["n_blocks"] = out["n_blocks"].astype(np.int64)
        out["covered"] = out["covered"].astype(np.int64)
        return out

    return keyed_hash_agg(ds, key_of, scan, partitions=partitions)
