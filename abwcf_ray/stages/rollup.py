"""ROLLUP aggregation: all prefix granularities of a group-key list in ONE
pass over the rows.

``GROUP BY ROLLUP(a, b)`` = the union of GROUP BY (a, b), (a), and ().
The distributed shape: map-side partial aggregation at the FINEST
granularity (per-batch vectorized pandas groupby — the combiner), ONE
keyed-partition merge of those partials (exchange O(distinct finest
combos), never O(rows); the high-cardinality-safe idiom from
dedup.keyed_hash_agg), then every coarser level is re-aggregated from the
MERGED FINEST TABLE — whose size is bounded by the distinct-combo count,
not the corpus — so rows are scanned exactly once no matter how many
levels the rollup has. Rolled-up columns take ``total_label`` (the SQL
twin COALESCEs its ROLLUP NULLs to the same sentinel).

All aggregates are exact int64 (count + integer sums) so the DuckDB
oracle hash-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import keyed_hash_agg


def rollup_counts(
    ds,
    *,
    group_cols: list[str],
    sum_col: str | None = None,
    total_label: str = "*",
    merge_partitions: int = 64,
) -> pd.DataFrame:
    """Aggregate ``count`` (+ ``sum_<sum_col>``) at every rollup prefix of
    ``group_cols`` (string columns). Returns a pandas DataFrame — rollup
    output is combo-bounded, small by construction. ``level`` marks the
    number of grouped (non-rolled-up) columns, mirroring what
    ``GROUPING()`` disambiguates in SQL (needed if a real group value ever
    equals ``total_label``)."""
    aggs = {"count": ("count", "sum")}
    if sum_col is not None:
        aggs[f"sum_{sum_col}"] = (f"sum_{sum_col}", "sum")

    def partial(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_pandas() for c in group_cols}
        cols["count"] = np.ones(t.num_rows, np.int64)
        if sum_col is not None:
            cols[f"sum_{sum_col}"] = (
                t.column(sum_col).to_numpy(zero_copy_only=False).astype(np.int64)
            )
        g = (
            pd.DataFrame(cols)
            .groupby(group_cols, as_index=False, sort=False)
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def key_of(b: pa.Table) -> np.ndarray:
        k = hash64(b.column(group_cols[0]))
        for c in group_cols[1:]:
            k = k * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b.column(c))
        return k

    finest = keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_of,
        lambda g: g.groupby(group_cols, as_index=False, sort=False).agg(**aggs),
        partitions=merge_partitions,
    ).to_pandas()

    levels = []
    for depth in range(len(group_cols), -1, -1):
        keep = group_cols[:depth]
        if depth == len(group_cols):
            lvl = finest.copy()
        elif keep:
            lvl = finest.groupby(keep, as_index=False, sort=False).agg(**aggs)
        else:
            lvl = pd.DataFrame([{k: finest[k].sum() for k in aggs}])
        for c in group_cols[depth:]:
            lvl[c] = total_label
        lvl["level"] = np.int64(depth)
        levels.append(lvl)

    out_cols = group_cols + list(aggs) + ["level"]
    out = pd.concat([lvl[out_cols] for lvl in levels], ignore_index=True)
    for k in aggs:
        out[k] = out[k].astype(np.int64)
    return out.sort_values(out_cols[: len(group_cols) + 1]).reset_index(drop=True)
