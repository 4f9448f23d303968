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


def interval_join(
    left_ds,
    right_ds,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
    left_id: str,
    right_id: str,
    partitions: int = 64,
):
    """Keyed interval OVERLAP join: all (left, right) pairs of the same
    key whose closed intervals strictly overlap (min(end) - max(start)
    > 0 — touching endpoints do NOT match), with the overlap length.
    The ad-tech / telemetry workhorse (impressions x sessions, crawl
    windows x outage windows).

    Distributed shape: both sides tagged and hash(key)-partitioned in
    ONE union + ONE keyed exchange (the equi_join bucketed idiom), then
    a per-shard vectorized enumerate: lefts sorted by start, for each
    right a searchsorted prefix (start < right_end) is exploded and
    filtered by end > right_start. The explode is bounded by the true
    join multiplicity plus the lefts that START before but END before
    the right starts — fine for bounded per-key interval counts (the
    session/calendar shape); a dense single-key pathology would want a
    plane-sweep instead (documented trade, same contract as the
    winfun PARTITION BY bound).

    Returns (key_col, left_id, right_id, overlap:int64).
    """
    from abwcf_ray.stages.dedup import keyed_hash_agg

    def tag(side: int, id_col: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_col: b.column(key_col).cast(pa.int64()),
                    "s": b.column(start_col).cast(pa.int64()),
                    "e": b.column(end_col).cast(pa.int64()),
                    "rid": b.column(id_col).cast(pa.int64()),
                    "side": pa.array(
                        np.full(b.num_rows, side, np.int64), pa.int64()
                    ),
                }
            )

        return fn

    both = left_ds.map_batches(tag(0, left_id), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1, right_id), batch_format="pyarrow")
    )

    def key_of(b: pa.Table) -> np.ndarray:
        return (
            b.column(key_col).to_numpy(zero_copy_only=False).view(np.uint64)
            * _GOLD
        )

    def join(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key_col: pd.Series([], dtype=np.int64),
                left_id: pd.Series([], dtype=np.int64),
                right_id: pd.Series([], dtype=np.int64),
                "overlap": pd.Series([], dtype=np.int64),
            }
        )
        L = g[g["side"] == 0]
        R = g[g["side"] == 1]
        if L.empty or R.empty:
            return empty
        # lefts sorted by (key, start); per-key segments via composite
        # offset so ONE searchsorted answers every right's prefix
        L = L.sort_values([key_col, "s"], kind="mergesort")
        lk = L[key_col].to_numpy(np.int64)
        ls = L["s"].to_numpy(np.int64)
        le = L["e"].to_numpy(np.int64)
        lid = L["rid"].to_numpy(np.int64)
        rk = R[key_col].to_numpy(np.int64)
        rs = R["s"].to_numpy(np.int64)
        re_ = R["e"].to_numpy(np.int64)
        rid_ = R["rid"].to_numpy(np.int64)
        # dense key codes shared by both sides (lefts already key-sorted)
        uk, lcode = np.unique(lk, return_inverse=True)
        rpos = np.searchsorted(uk, rk)
        rhas = (rpos < len(uk)) & (uk[np.minimum(rpos, len(uk) - 1)] == rk)
        lo_all = int(min(ls.min(), rs.min()))
        hi_all = int(max(le.max(), re_.max()))
        big = np.int64(hi_all - lo_all + 2)
        lcomp = lcode.astype(np.int64) * big + (ls - lo_all)
        # rights with keys absent from the left side match nothing
        rpos, rs, re_, rid_, rk = (
            rpos[rhas], rs[rhas], re_[rhas], rid_[rhas], rk[rhas],
        )
        if len(rs) == 0:
            return empty
        # prefix bound: lefts of the same key with start < right_end
        # (strict: a left starting AT right_end cannot overlap > 0)
        rcomp_hi = rpos.astype(np.int64) * big + np.minimum(
            re_ - lo_all, big - 1
        )
        hi = np.searchsorted(lcomp, rcomp_hi, "left")
        lo = np.searchsorted(lcomp, rpos.astype(np.int64) * big, "left")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        seg = np.concatenate([[0], np.cumsum(cnt)])[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(seg, cnt)
        li = np.repeat(lo, cnt) + within
        ri = np.repeat(np.arange(len(rs), dtype=np.int64), cnt)
        ov = np.minimum(le[li], re_[ri]) - np.maximum(ls[li], rs[ri])
        keep = ov > 0
        return pd.DataFrame(
            {
                key_col: rk[ri][keep],
                left_id: lid[li][keep],
                right_id: rid_[ri][keep],
                "overlap": ov[keep].astype(np.int64),
            }
        )

    return keyed_hash_agg(both, key_of, join, partitions=partitions)


def peak_concurrency(
    ds,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
    partitions: int = 16,
):
    """Per-key PEAK CONCURRENCY — the sweep-line maximum of
    simultaneously-open intervals (max concurrent sessions per host,
    peak in-flight fetches): every interval contributes (+1 at start,
    -1 at end), the running sum over (ts, delta) order is the live
    count, its max is the peak. Half-open [s, e) semantics: the -1
    sorts BEFORE the +1 at an equal timestamp (delta ascending), so an
    interval ending exactly when another starts does not overlap it —
    the same rule the SQL oracle writes as ORDER BY ts, delta.

    ONE hash(key) exchange of 2 rows per interval, per-shard vectorized
    cumsum + segmented max. Returns (key_col, peak:int64,
    n_intervals:int64).
    """
    from abwcf_ray.stages.dedup import keyed_hash_agg

    def deltas(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column(start_col).to_numpy(zero_copy_only=False).astype(np.int64)
        e = b.column(end_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                key_col: np.concatenate([k, k]),
                "ts": np.concatenate([s, e]),
                "delta": np.concatenate(
                    [np.ones(len(k), np.int64), -np.ones(len(k), np.int64)]
                ),
            }
        )

    def key_of(b: pa.Table) -> np.ndarray:
        return (
            b.column(key_col).to_numpy(zero_copy_only=False).view(np.uint64)
            * _GOLD
        )

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=np.int64),
                    "peak": pd.Series([], dtype=np.int64),
                    "n_intervals": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values([key_col, "ts", "delta"], kind="mergesort")
        keys = g[key_col].to_numpy(np.int64)
        d = g["delta"].to_numpy(np.int64)
        run = np.cumsum(d)
        new = np.empty(len(g), bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        start_idx = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        base = np.where(start_idx > 0, run[start_idx - 1], 0)
        live = run - base[gid]
        peak = np.zeros(len(start_idx), np.int64)
        np.maximum.at(peak, gid, live)
        n_iv = np.bincount(gid, weights=(d > 0)).astype(np.int64)
        return pd.DataFrame(
            {
                key_col: keys[start_idx],
                "peak": peak,
                "n_intervals": n_iv,
            }
        )

    return keyed_hash_agg(
        ds.map_batches(deltas, batch_format="pyarrow"),
        key_of,
        sweep,
        partitions=partitions,
    )


def interval_union(
    ds,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
    partitions: int = 64,
):
    """Original name of :func:`interval_coverage` (kept for the
    user_coverage query and external callers): Dataset of
    (key, start:int64, end:int64) -> (key_col, n_blocks:int64,
    covered:int64) — merged-interval count and total covered length per
    key, touching intervals merge (strict ``>`` break test), all int64.
    The two entry points run the SAME vectorized gaps-and-islands merge;
    see interval_coverage for the distributed shape."""
    return interval_coverage(
        ds,
        key_col=key_col,
        start_col=start_col,
        end_col=end_col,
        partitions=partitions,
    )
