"""Windowed aggregates over an ordered, keyed event stream.

Ray Data has no event-time windowing primitives; per the streaming mapping
(SURVEY.md §2 G / ray_guide "Streaming-shaped workloads"), windows are
expressed as ``groupby(key).map_groups(fn)`` where ``fn`` sorts the group by
timestamp and applies the windowing vectorized in pandas:

- tumbling: ``window_id = ts // size`` (pure projection — implemented as a
  partial per-batch aggregate in __ray_entry__._q_events_window, no
  map_groups needed);
- sliding:  every window of width W advancing by S that an event falls in;
- session:  gap-based — a new session starts when the time since the
  previous event of the same key exceeds ``gap`` (cumsum over a boolean
  break vector; identical semantics to the SQL lag+cumsum idiom, so the
  DuckDB oracle can replicate it).

The group key is the partitioning assumption: all events of one key meet in
one group (hash shuffle by key), and windows never span keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _mix_partition(series: pd.Series, partitions: int) -> np.ndarray:
    """Stable partition id for a key column (numeric or string)."""
    if pd.api.types.is_integer_dtype(series):
        # multiply-then-SHIFT (dedup._int_pkey's shape): a bare
        # (v * odd) % partitions depends only on v's low bits, so
        # stride-aligned key domains would collapse into one partition
        v = series.to_numpy(dtype=np.int64, na_value=0).astype(np.uint64)
        m = (v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(29)
        return (m % np.uint64(partitions)).astype(np.int64)
    from abwcf_ray.functions.hashing import hash64

    return (hash64(series.astype(str).tolist()) % np.uint64(partitions)).astype(
        np.int64
    )


def session_windows(
    ds,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    gap_us: int,
    partitions: int = 32,
):
    """-> one row per (key, session): session_id (0-based per key),
    session_start (µs), n_events, sum_value.

    ``sum_value`` is ROUNDED to 4 decimals: sub-session partial sums
    merge across the two stages in a layout-dependent order, so raw
    float sums would differ in the last bits between runs; the rounding
    pins a canonical value (and is what the SQL oracle mirrors). Pass
    integer-scaled values upstream if exact sums are required.

    Skew-safe two-stage shape (a naive ``groupby(key)`` makes one hot key
    one unbounded group): stage 1 partitions by hash(key, coarse time
    bucket) and computes bucket-local session SUMMARIES vectorized (a hot
    key's events spread over its buckets); stage 2 partitions by hash(key)
    and stitches summaries whose boundary gap <= ``gap_us`` back into
    global sessions. Stage-2 rows are 5-column session summaries — bounded
    by session count, not event count, so a key with millions of events in
    long sessions costs KBs, not GBs. (Residual contract: a key whose
    events form millions of one-event sessions still concentrates its
    summaries in one stage-2 group.) Semantics are identical to the
    single-pass groupby: within a bucket, splits are exact; across
    adjacent buckets, two sessions merge iff the boundary gap <= gap, and
    chains of merges are resolved by the same cumsum."""
    coarse_us = max(gap_us, 1) * 32

    def to_us(batch):
        import pyarrow as pa

        # normalize the unit BEFORE the int cast — a timestamp[ns] column
        # cast straight to int64 would yield nanoseconds and break every
        # µs-denominated gap comparison
        col = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        batch = batch.set_column(
            batch.schema.get_field_index(ts_col), ts_col, col
        )
        bucket = pa.compute.floor(
            pa.compute.divide(col.cast(pa.float64()), float(coarse_us))
        ).cast(pa.int64())
        df = batch.to_pandas()
        df["bucket"] = bucket.to_pandas().to_numpy()
        df["pkey"] = _mix_partition(
            df[key].astype(str) + "|" + df["bucket"].astype(str), partitions
        )
        return df

    def bucket_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "bucket", ts_col, value_col], kind="mergesort")
        ts = g[ts_col].to_numpy(dtype=np.int64)
        new_kb = (
            (g[key] != g[key].shift()) | (g["bucket"] != g["bucket"].shift())
        ).to_numpy(dtype=bool)
        brk = new_kb.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(brk) - 1
        out = pd.DataFrame(
            {
                key: g[key].to_numpy(),
                "sid": sid,
                "ts_us": ts,
                "value": g[value_col].to_numpy(),
            }
        )
        agg = out.groupby("sid").agg(
            first_ts=("ts_us", "min"),
            last_ts=("ts_us", "max"),
            n_events=("value", "size"),
            sum_value=("value", "sum"),
        )
        agg[key] = out.groupby("sid")[key].first()
        agg = agg.reset_index(drop=True)
        agg["skey"] = _mix_partition(agg[key], partitions)
        return agg[[key, "skey", "first_ts", "last_ts", "n_events", "sum_value"]]

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "first_ts", "last_ts"], kind="mergesort")
        first = g["first_ts"].to_numpy(dtype=np.int64)
        last = g["last_ts"].to_numpy(dtype=np.int64)
        new_key = (g[key] != g[key].shift()).to_numpy(dtype=bool)
        brk = new_key.copy()
        brk[1:] |= (first[1:] - last[:-1]) > gap_us
        mid = np.cumsum(brk) - 1
        tmp = pd.DataFrame(
            {
                key: g[key].to_numpy(),
                "mid": mid,
                "first_ts": first,
                "n_events": g["n_events"].to_numpy(dtype=np.int64),
                "sum_value": g["sum_value"].to_numpy(),
            }
        )
        agg = tmp.groupby("mid").agg(
            session_start=("first_ts", "min"),
            n_events=("n_events", "sum"),
            sum_value=("sum_value", "sum"),
        )
        agg[key] = tmp.groupby("mid")[key].first()
        agg = agg.reset_index(drop=True).sort_values(
            [key, "session_start"], kind="mergesort"
        )
        agg["session_id"] = agg.groupby(key, sort=False).cumcount().astype(np.int64)
        agg["n_events"] = agg["n_events"].astype(np.int64)
        agg["sum_value"] = agg["sum_value"].round(4)
        return agg[[key, "session_id", "session_start", "n_events", "sum_value"]].reset_index(
            drop=True
        )

    return (
        ds.map_batches(to_us, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(bucket_sessions, batch_format="pandas")
        .groupby("skey")
        .map_groups(stitch, batch_format="pandas")
    )


def _key_window_pkey(b, key: str, window_col: str) -> np.ndarray:
    """Mixed hash of (key, window) for the keyed merge — integer keys mix
    numerically, string keys through hash64 (the old native groupby
    accepted both; so does this)."""
    kc = b.column(key)
    import pyarrow as pa

    if pa.types.is_integer(kc.type):
        k = kc.to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        from abwcf_ray.functions.hashing import hash64

        k = hash64(kc)
    w = b.column(window_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    return (k * np.uint64(0x9E3779B97F4A7C15) ^ w).astype(np.int64)


def sliding_windows(ds, *, key: str, ts_col: str, value_col: str,
                    width_us: int, slide_us: int):
    """-> (key, window_start, n_events, sum_value) for every sliding window
    [window_start, window_start + width) that contains >= 1 event of the
    key. Each event belongs to ``width/slide`` windows; the explode is done
    per batch (vectorized), then one groupby aggregates — the standard
    map-side window-assignment pattern."""
    import pyarrow as pa

    n_windows = int(np.ceil(width_us / slide_us))

    def assign(batch: pa.Table) -> pa.Table:
        ts = (
            batch.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        last = (ts // slide_us) * slide_us  # last window containing the event
        out_k, out_w, out_v = [], [], []
        for j in range(n_windows):
            w = last - j * slide_us
            keep = ts < w + width_us
            keep &= w >= 0
            out_k.append(keys[keep])
            out_w.append(w[keep])
            out_v.append(vals[keep])
        return pa.table(
            {
                key: pa.array(np.concatenate(out_k)),
                "window_start": pa.array(np.concatenate(out_w), pa.int64()),
                value_col: pa.array(np.concatenate(out_v)),
            }
        )

    # keyed-partition merge instead of the native (key, window) groupby:
    # cardinality = keys × windows is output-sized, and Ray's sort-based
    # aggregate on that key measured 22× slower than hashing it into 64
    # partitions (dedup.keyed_hash_agg). Association structure of the
    # float sum is unchanged — the native Sum is also a block-partial
    # combine, and the partial here is per (key, window) within a batch.
    from abwcf_ray.stages.dedup import keyed_hash_agg

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby([key, "window_start"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def _wkey(b: pa.Table) -> np.ndarray:
        return _key_window_pkey(b, key, "window_start")

    return keyed_hash_agg(
        ds.map_batches(assign, batch_format="pyarrow").map_batches(
            partial, batch_format="pyarrow"
        ),
        _wkey,
        lambda g: g.groupby([key, "window_start"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        ),
    )


def tumbling_windows(ds, *, key: str, ts_col: str, value_col: str, width_us: int):
    """-> (key, window_id, n_events, sum_value) for tumbling windows of
    ``width_us``. Same keyed-partition merge as :func:`sliding_windows`
    (the (key, window) aggregate key is output-sized — the native
    sort-aggregate pathology); timestamp unit normalized before the int
    cast so window ids are microseconds regardless of input unit."""
    import pyarrow as pa

    from abwcf_ray.stages.dedup import keyed_hash_agg

    def partial(batch: pa.Table) -> pa.Table:
        us = (
            batch.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        df = pd.DataFrame(
            {
                key: batch.column(key).to_numpy(zero_copy_only=False),
                "window_id": us // width_us,
                value_col: batch.column(value_col).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby([key, "window_id"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def _wkey(b: pa.Table) -> np.ndarray:
        return _key_window_pkey(b, key, "window_id")

    return keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        _wkey,
        lambda g: g.groupby([key, "window_id"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        ),
    )
