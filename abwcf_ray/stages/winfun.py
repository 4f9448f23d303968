"""Keyed (partitioned) window functions: ROW_NUMBER, running SUM, LAG.

The SQL shape this mirrors is

    <fn>() OVER (PARTITION BY key ORDER BY order_cols..., id)

— the per-entity ordered scan every event/log pipeline needs (per-user
running totals, inter-arrival gaps, per-host sequence numbers). Ray Data
has no window operator; the distributed shape here is the repo's standard
keyed-partition exchange:

1. map-side: tag each row with ``hash(key) % partitions`` (a SMALL int
   partition key — never the raw key domain; see dedup.keyed_hash_agg for
   the measured 22x rationale),
2. ONE keyed exchange lands every row of a key in the same shard
   (hash-bounded skew: a shard holds ~1/P of the rows),
3. per-shard: ONE numpy lexsort by (key, order..., id) then fully
   vectorized segmented scans — group starts from key-change flags,
   ROW_NUMBER = index - group_start + 1, running sum = cumsum minus the
   group-start offset, LAG = shift with a sentinel at group starts.

Nothing materializes on the driver; exchange volume is the input rows
exactly once. Values stay exact int64 end-to-end so the DuckDB oracle
hash-matches (the repetition_signals discipline: no float accumulation).

Scale note: one key's rows must fit in one shard's memory alongside the
rest of its partition — the same contract as every PARTITION BY engine's
hash exchange. At 100 TB, size ``partitions`` to cluster width; a single
pathological key (one user with 10^10 events) would need the windowed
pre-aggregation in stages/windows.py instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import _int_pkey

DEFAULT_WINFUN_PARTITIONS = 64


def _pkey_of(col: pa.ChunkedArray, partitions: int) -> np.ndarray:
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return (hash64(col) % np.uint64(partitions)).astype(np.int64)
    v = col.to_numpy(zero_copy_only=False).astype(np.int64)
    return _int_pkey(v, partitions)


def keyed_window_functions(
    ds,
    *,
    key_col: str,
    order_cols: list[str],
    sum_col: str | None = None,
    lag_col: str | None = None,
    lag_sentinel: int = -1,
    dense_rank_cols: list[str] | None = None,
    rank_cols: list[str] | None = None,
    ntile: int | None = None,
    roll_rows: int | None = None,
    max_col: str | None = None,
    partitions: int = DEFAULT_WINFUN_PARTITIONS,
):
    """Append per-key ordered window columns to ``ds``.

    - ``rn``: ROW_NUMBER() OVER (PARTITION BY key ORDER BY order_cols) —
      1-based; ``order_cols`` must be a total order within each key (append
      a unique id as the last order col).
    - ``run_sum`` (if ``sum_col``): running SUM(sum_col) over the same
      window, ROWS UNBOUNDED PRECEDING — exact int64.
    - ``lag_prev`` (if ``lag_col``): LAG(lag_col, 1) over the same window,
      ``lag_sentinel`` for each key's first row (COALESCE in the oracle).
    - ``dense_rank`` (if ``dense_rank_cols``): DENSE_RANK() over the key
      ordered by ``dense_rank_cols`` ONLY — a strict prefix of
      ``order_cols`` (the remaining order cols are just the deterministic
      tiebreak; dense rank is tie-aware by definition, so it increments on
      value change, not row change).
    - ``rank`` / ``pct_rank`` / ``cume_dist`` (if ``rank_cols``): SQL
      RANK(), PERCENT_RANK() and CUME_DIST() over the key ordered by
      ``rank_cols`` ONLY (a prefix of ``order_cols``, like
      ``dense_rank_cols``). The two distribution stats are each ONE IEEE
      division of exact int64s — (rank-1)/(cnt-1) with the SQL-defined 0
      for single-row keys, and (rows ≤ current value)/cnt — so they
      hash-match DuckDB bit-for-bit.
    - ``roll_sum`` (if ``sum_col`` and ``roll_rows=k``): moving SUM over
      ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW — the fixed-depth
      smoothing window; exact int64, one cumsum + one clamped gather, no
      per-row loop.
    - ``run_max`` / ``drawdown`` (if ``max_col``): running MAX(max_col)
      over ROWS UNBOUNDED PRECEDING and its gap to the current value —
      the peak/drawdown analytics pair; exact int64.
    - ``ntile`` (if ``ntile=t``): NTILE(t) over the full window order —
      standard SQL bucketing (first ``cnt % t`` buckets get one extra
      row), vectorized off group sizes; needs no second pass because each
      key's rows are already whole in one shard.

    ``order_cols``, ``sum_col`` and ``lag_col`` must be integer-valued
    (cast timestamps to epoch microseconds upstream). Output rows are the
    input rows (order not preserved — Datasets are unordered bags) with
    the window columns appended.
    """
    if dense_rank_cols is not None and (
        list(dense_rank_cols) != order_cols[: len(dense_rank_cols)]
    ):
        raise ValueError("dense_rank_cols must be a prefix of order_cols")
    if rank_cols is not None and (
        list(rank_cols) != order_cols[: len(rank_cols)]
    ):
        raise ValueError("rank_cols must be a prefix of order_cols")
    if ntile is not None and ntile < 1:
        raise ValueError("ntile must be >= 1")
    if roll_rows is not None and (sum_col is None or roll_rows < 1):
        raise ValueError("roll_rows needs sum_col and roll_rows >= 1")

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_pkey", pa.array(_pkey_of(t.column(key_col), partitions), pa.int64())
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_pkey")
        n = len(g)
        if n == 0:
            return g
        # group rows by key without sorting the raw key domain: factorize
        # codes only need to make equal keys contiguous, and the scans below
        # are per-key, so inter-key order is irrelevant to the output values
        codes, _ = pd.factorize(g[key_col].to_numpy(), use_na_sentinel=False)
        sort_keys = [g[c].to_numpy(np.int64) for c in reversed(order_cols)]
        order = np.lexsort((*sort_keys, codes))
        cs = codes[order]
        new = np.empty(n, bool)
        new[0] = True
        np.not_equal(cs[1:], cs[:-1], out=new[1:])
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        out = g.iloc[order].reset_index(drop=True)
        out["rn"] = idx - start + 1
        if max_col is not None:
            # running MAX(max_col) + drawdown (run_max - current): the
            # peak-tracking window — one C-level grouped cummax
            mv = out[max_col].to_numpy(np.int64)
            rm = pd.Series(mv).groupby(cs).cummax().to_numpy(np.int64)
            out["run_max"] = rm
            out["drawdown"] = rm - mv
        if sum_col is not None:
            v = out[sum_col].to_numpy(np.int64)
            c = np.cumsum(v)
            out["run_sum"] = c - c[start] + v[start]
            if roll_rows is not None:
                pos = idx - start
                base = c[start] - v[start]  # prefix mass before the key
                k = roll_rows
                out["roll_sum"] = c - np.where(
                    pos >= k, c[np.maximum(idx - k, 0)], base
                )
        if lag_col is not None:
            lv = out[lag_col].to_numpy(np.int64)
            prev = np.empty(n, np.int64)
            prev[1:] = lv[:-1]
            prev[new] = lag_sentinel
            out["lag_prev"] = prev
        if dense_rank_cols is not None:
            chg = new.copy()
            for c in dense_rank_cols:
                v = out[c].to_numpy(np.int64)
                chg[1:] |= v[1:] != v[:-1]
            d = np.cumsum(chg)
            out["dense_rank"] = d - d[start] + 1
        if rank_cols is not None:
            chg = new.copy()
            for c in rank_cols:
                v = out[c].to_numpy(np.int64)
                chg[1:] |= v[1:] != v[:-1]
            run_start = np.maximum.accumulate(np.where(chg, idx, 0))
            out["rank"] = run_start - start + 1
            run_id = np.cumsum(chg) - 1
            run_end = (np.cumsum(np.bincount(run_id)) - 1)[run_id]
            kid = np.cumsum(new) - 1
            kcnt = np.bincount(kid)[kid]
            denom = np.maximum(kcnt - 1, 1)  # SQL: pct_rank of a 1-row key is 0
            out["pct_rank"] = (run_start - start).astype(np.float64) / denom
            out["cume_dist"] = (run_end - start + 1).astype(
                np.float64
            ) / kcnt.astype(np.float64)
        if ntile is not None:
            gid = np.cumsum(new) - 1
            cnt = np.bincount(gid)[gid]
            pos = idx - start  # 0-based row number within the key
            q, r = cnt // ntile, cnt % ntile
            thr = r * (q + 1)
            # np.where evaluates both branches: clamp q to dodge a /0 on
            # groups smaller than ntile (their rows all take the thr branch)
            out["ntile"] = (
                np.where(pos < thr, pos // (q + 1), r + (pos - thr) // np.maximum(q, 1))
                + 1
            )
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(scan, batch_format="pandas")
    )


def cumulative_distinct(
    ds,
    *,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "n_distinct_seen",
    id_col: str | None = None,
    partitions: int = DEFAULT_WINFUN_PARTITIONS,
):
    """Per-row CUMULATIVE DISTINCT COUNT — for each row, how many
    distinct ``value_col`` values its key has produced up to and
    including that row in the (order_cols) order. SQL has no
    COUNT(DISTINCT) OVER; the standard rewrite (first-occurrence flag
    via ROW_NUMBER() = 1 per (key, value), then SUM(flag) OVER the
    running frame) is what the oracle mirrors — and what this computes
    vectorized per shard.

    Distributed shape: the keyed_window_functions idiom — ONE
    hash(key)-keyed exchange (every row of a key in one shard), then a
    per-shard mergesort by (key, order_cols) + one pandas duplicated()
    pass over (key, value) (first-occurrence flags in exactly that
    order) + one grouped cumsum. Exact int64 end-to-end.

    Returns the rows of ``id_col`` (or all input columns when None)
    plus ``out_col``.
    """

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_pkey", pa.array(_pkey_of(b.column(key_col), partitions))
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_pkey")
        if len(g) == 0:
            cols = [id_col] if id_col else list(g.columns)
            out = g[[c for c in cols if c in g.columns]].copy()
            out[out_col] = pd.Series([], dtype=np.int64)
            return out
        g = g.sort_values(
            [key_col, *order_cols], kind="mergesort"
        ).reset_index(drop=True)
        first = (~g.duplicated(subset=[key_col, value_col])).to_numpy(
            np.int64
        )
        cum = np.cumsum(first)
        keys = g[key_col].to_numpy()
        new = np.empty(len(g), bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        start_idx = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        # cumulative distinct within the key = global cumsum minus the
        # cumsum just before the key's first row
        base = np.where(start_idx > 0, cum[start_idx - 1], 0)
        seen = cum - base[gid]
        out = g[[id_col]].copy() if id_col else g.copy()
        out[out_col] = seen.astype(np.int64)
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(scan, batch_format="pandas")
    )


def range_frame_agg(
    ds,
    *,
    key_col: str,
    ts_col: str,
    weight_col: str,
    range_preceding: int,
    id_col: str,
    partitions: int = DEFAULT_WINFUN_PARTITIONS,
):
    """Per-row RANGE time-frame aggregate — SQL's

        COUNT(*) / SUM(w) OVER (PARTITION BY key ORDER BY ts
                                RANGE BETWEEN X PRECEDING AND CURRENT ROW)

    (events-in-the-last-hour rate limiting, burst detection, crawl-rate
    windows). RANGE frames are defined on the ORDER BY *value*: the
    frame of row i is every row j of the key with ts_j in
    [ts_i - X, ts_i], INCLUDING later peers with equal ts — so the
    result is a pure function of the ts multiset (deterministic under
    ties with no tie-break column).

    Distributed shape: the keyed-exchange idiom, then a per-shard
    TWO-searchsorted pass with a composite segment-offset key — each
    key segment's timestamps are lifted onto disjoint ranges
    (seg_id * BIG + (ts - min), BIG > span + X) so ONE globally sorted
    array answers every per-key window query; no per-key Python loop.
    Counts and weighted sums are exact int64 (prefix sums).

    Returns (id_col, n_frame:int64, w_frame:int64).
    """

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_pkey", pa.array(_pkey_of(b.column(key_col), partitions))
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_pkey")
        if len(g) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=np.int64),
                    "n_frame": pd.Series([], dtype=np.int64),
                    "w_frame": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy(np.int64)
        w = g[weight_col].to_numpy(np.int64)
        new = np.empty(len(g), bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        seg = np.cumsum(new) - 1
        tmin = int(ts.min())
        big = int(ts.max()) - tmin + range_preceding + 1
        # composite (segment, ts) key: seg*big + (ts-tmin) is sorted and
        # frame queries never cross a segment band. seg*big overflows
        # int64 once segments*span exceeds 2^63 (a year of µs timestamps
        # caps a shard at ~290k keys), so segments process in CHUNKS whose
        # local seg index keeps the product under 2^62 — same math, same
        # vectorization, a few iterations at worst.
        nseg = int(seg[-1]) + 1
        seg_starts = np.flatnonzero(new)
        max_chunk = max(1, int((1 << 62) // big))
        lo = np.empty(len(g), np.int64)
        hi = np.empty(len(g), np.int64)
        for c0 in range(0, nseg, max_chunk):
            c1 = min(c0 + max_chunk, nseg)
            r0 = int(seg_starts[c0])
            r1 = int(seg_starts[c1]) if c1 < nseg else len(g)
            comp = (seg[r0:r1] - c0) * np.int64(big) + (ts[r0:r1] - tmin)
            lo[r0:r1] = (
                np.searchsorted(comp, comp - np.int64(range_preceding), "left")
                + r0
            )
            hi[r0:r1] = np.searchsorted(comp, comp, "right") + r0
        cs = np.concatenate([[0], np.cumsum(w)])
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(np.int64),
                "n_frame": (hi - lo).astype(np.int64),
                "w_frame": (cs[hi] - cs[lo]).astype(np.int64),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(scan, batch_format="pandas")
    )


def last_match_before(
    ds,
    *,
    key_col: str,
    order_cols: list[str],
    source_col: str,
    target_col: str,
    id_col: str,
    partitions: int = DEFAULT_WINFUN_PARTITIONS,
):
    """LAST-TOUCH ATTRIBUTION — for every TARGET row (target_col != 0),
    the id of the latest prior SOURCE row (source_col != 0) of the same
    key in (order_cols) order, or -1 when no source precedes it. The
    marketing/funnels workhorse ("which touchpoint preceded this
    conversion"), and SQL's

        MAX(CASE WHEN source THEN pos END) OVER (PARTITION BY key
            ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)

    joined back from position to id.

    Per keyed shard: one lexsort, one running maximum of source
    positions with a segment-base validity test (a carried value from
    the previous key has a position before this key's first row — one
    vectorized compare replaces a segmented reset). No per-row loop.

    Returns (id_col of the target row, attr_id — the source row's id).
    """

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_pkey", pa.array(_pkey_of(b.column(key_col), partitions))
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_pkey")
        if len(g) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=np.int64),
                    "attr_id": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values([key_col, *order_cols], kind="mergesort").reset_index(
            drop=True
        )
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy(np.int64)
        is_src = g[source_col].to_numpy() != 0
        is_tgt = g[target_col].to_numpy() != 0
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        seg_start = np.maximum.accumulate(np.where(new, idx, 0))
        src_pos = np.where(is_src, idx, -1)
        run = np.maximum.accumulate(src_pos)
        prev = np.empty(n, np.int64)
        prev[0] = -1
        prev[1:] = run[:-1]
        valid = prev >= seg_start  # a carried max from another key fails this
        attr = np.where(valid, ids[np.maximum(prev, 0)], -1)
        return pd.DataFrame(
            {id_col: ids[is_tgt], "attr_id": attr[is_tgt].astype(np.int64)}
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(scan, batch_format="pandas")
    )
