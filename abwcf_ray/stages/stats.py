"""Grouped moment statistics: COUNT / SUM / SUM(x²) / MIN / MAX per group
in one pass, with mean and population variance derived EXACTLY.

The distributed shape is the repo's standard high-cardinality aggregate:
map-side combiner per batch (vectorized pandas groupby over count, sum,
sumsq, min, max — all five partials merge associatively), ONE
keyed-partition exchange of the partials (O(distinct groups), never
O(rows); the dedup.keyed_hash_agg idiom), then mean/variance computed
from the merged integer moments.

Float discipline (the repetition_signals contract): every accumulated
quantity is exact int64; mean and var_pop are SINGLE IEEE divisions of
exact integers —

    mean    = sum / n
    var_pop = (n·sumsq − sum²) / n²

so a DuckDB oracle hash-matches by computing the same two expressions
(NOT var_pop(), whose streaming Welford recurrence rounds differently).
int64 bound contract: callers must keep n·sumsq and sum² under 2^63
(values up to ~10^4 over ~10^9 rows/group fit; pre-scale or shard wider
otherwise) — the same caller bound as every exact-int stage here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import keyed_hash_agg

_AGGS = {
    "count": ("count", "sum"),
    "sum": ("sum", "sum"),
    "sumsq": ("sumsq", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def group_stats(
    ds,
    *,
    group_cols: list[str],
    value_col: str,
    merge_partitions: int = 64,
):
    """Per-group moments of integer ``value_col``: returns a Dataset with
    ``group_cols + [count, sum, sumsq, min, max, mean, var_pop]``.
    ``mean``/``var_pop`` are float64 via one IEEE division each of exact
    int64 moments (bit-reproducible across layouts and in SQL)."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {c: t.column(c).to_pandas() for c in group_cols}
        cols.update(
            count=np.ones(t.num_rows, np.int64), sum=v, sumsq=v * v, min=v, max=v
        )
        g = (
            pd.DataFrame(cols)
            .groupby(group_cols, as_index=False, sort=False)
            .agg(**_AGGS)
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def key_of(b: pa.Table) -> np.ndarray:
        k = hash64(b.column(group_cols[0]))
        for c in group_cols[1:]:
            k = k * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b.column(c))
        return k

    merged = keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_of,
        lambda g: g.groupby(group_cols, as_index=False, sort=False).agg(**_AGGS),
        partitions=merge_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("count").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("sum").to_numpy(zero_copy_only=False).astype(np.int64)
        sq = t.column("sumsq").to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.append_column("mean", pa.array(s.astype(np.float64) / n, pa.float64()))
        num = n * sq - s * s
        return t.append_column(
            "var_pop",
            pa.array(num.astype(np.float64) / (n * n).astype(np.float64)),
        )

    return merged.map_batches(finish, batch_format="pyarrow")
