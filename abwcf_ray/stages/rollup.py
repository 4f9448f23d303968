"""ROLLUP / CUBE aggregation: many granularities of a group-key list in
ONE pass over the rows.

``GROUP BY ROLLUP(a, b)`` = the union of GROUP BY (a, b), (a), and ();
``GROUP BY CUBE(a, b)`` = GROUP BY every SUBSET of {a, b}. The
distributed shape is shared: map-side partial aggregation at the FINEST
granularity (per-batch vectorized pandas groupby — the combiner), ONE
keyed-partition merge of those partials (exchange O(distinct finest
combos), never O(rows); the high-cardinality-safe idiom from
dedup.keyed_hash_agg), then every coarser level is re-aggregated from the
MERGED FINEST TABLE — whose size is bounded by the distinct-combo count,
not the corpus — so rows are scanned exactly once no matter how many
levels the rollup/cube has (2^n subsets cost 2^n scans of the SMALL
merged table, zero extra passes over the data). Rolled-up columns take
``total_label`` (the SQL twin COALESCEs its ROLLUP/CUBE NULLs to the
same sentinel).

All aggregates are exact int64 (count + integer sums) so the DuckDB
oracle hash-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import keyed_hash_agg


def _aggs_for(sum_col: str | None) -> dict:
    aggs = {"count": ("count", "sum")}
    if sum_col is not None:
        aggs[f"sum_{sum_col}"] = (f"sum_{sum_col}", "sum")
    return aggs


def _merged_finest(
    ds, group_cols: list[str], sum_col: str | None, merge_partitions: int
) -> pd.DataFrame:
    """The shared first pass: per-batch combiner at the finest granularity,
    ONE keyed merge — returns the combo-bounded finest table on the driver
    (small by construction; every rollup/cube level derives from it)."""
    aggs = _aggs_for(sum_col)

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

    return keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_of,
        lambda g: g.groupby(group_cols, as_index=False, sort=False).agg(**aggs),
        partitions=merge_partitions,
    ).to_pandas()


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
    aggs = _aggs_for(sum_col)
    finest = _merged_finest(ds, group_cols, sum_col, merge_partitions)

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


def cube_counts(
    ds,
    *,
    group_cols: list[str],
    sum_col: str | None = None,
    total_label: str = "*",
    merge_partitions: int = 64,
) -> pd.DataFrame:
    """``GROUP BY CUBE(group_cols)``: ``count`` (+ ``sum_<sum_col>``) for
    EVERY subset of the group columns — 2^n granularities from the one
    shared finest-level pass (no extra scans of the data). ``grouping``
    mirrors SQL's ``GROUPING(a, b, ...)`` bitmask exactly: bit ``n-1-i``
    set iff ``group_cols[i]`` is rolled up in that output row, so the
    DuckDB twin disambiguates identically even when a real group value
    equals ``total_label``."""
    aggs = _aggs_for(sum_col)
    finest = _merged_finest(ds, group_cols, sum_col, merge_partitions)

    n = len(group_cols)
    levels = []
    for mask in range(1 << n):
        keep = [c for i, c in enumerate(group_cols) if not (mask >> (n - 1 - i)) & 1]
        if not keep:
            lvl = pd.DataFrame([{k: finest[k].sum() for k in aggs}])
        elif len(keep) == n:
            lvl = finest.copy()
        else:
            lvl = finest.groupby(keep, as_index=False, sort=False).agg(**aggs)
        for c in group_cols:
            if c not in keep:
                lvl[c] = total_label
        lvl["grouping"] = np.int64(mask)
        levels.append(lvl)

    out_cols = group_cols + list(aggs) + ["grouping"]
    out = pd.concat([lvl[out_cols] for lvl in levels], ignore_index=True)
    for k in aggs:
        out[k] = out[k].astype(np.int64)
    return out.sort_values(["grouping", *group_cols]).reset_index(drop=True)
