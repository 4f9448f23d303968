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


def session_windows(ds, *, key: str, ts_col: str, value_col: str, gap_us: int):
    """-> one row per (key, session): session_id (0-based per key),
    session_start (µs), n_events, sum_value."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, value_col], kind="mergesort")
        ts = g[ts_col].astype("int64").to_numpy()
        breaks = np.ones(len(ts), dtype=bool)
        breaks[1:] = (ts[1:] - ts[:-1]) > gap_us
        session = np.cumsum(breaks) - 1
        out = pd.DataFrame(
            {
                key: g[key].to_numpy(),
                "session_id": session.astype(np.int64),
                "ts_us": ts,
                "value": g[value_col].to_numpy(),
            }
        )
        agg = out.groupby("session_id").agg(
            session_start=("ts_us", "min"),
            n_events=("value", "size"),
            sum_value=("value", "sum"),
        )
        agg = agg.reset_index()
        agg[key] = g[key].iloc[0]
        agg["n_events"] = agg["n_events"].astype(np.int64)
        agg["sum_value"] = agg["sum_value"].round(4)
        return agg[[key, "session_id", "session_start", "n_events", "sum_value"]]

    def to_us(batch):
        import pyarrow as pa

        # normalize the unit BEFORE the int cast — a timestamp[ns] column
        # cast straight to int64 would yield nanoseconds and break every
        # µs-denominated gap comparison
        col = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        return batch.set_column(batch.schema.get_field_index(ts_col), ts_col, col)

    return (
        ds.map_batches(to_us, batch_format="pyarrow")
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


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

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum(value_col, alias_name="sum_value"))
    )
    return out
