"""Global total-order rank: ROW_NUMBER() OVER (ORDER BY key, id).

Distributed total ordering is the one capability an order-insensitive
value compare cannot see through any other operator — Ray Data's ``sort``
returns sorted blocks but no global positions. This stage assigns the
EXACT 1-based global rank of every row under (key asc|desc, id asc) with
one histogram pass + one range exchange — the classic sampled-range
total-order sort (TeraSort shape), made exact:

1. **histogram pass** (map-side only, no shuffle): per-batch sparse
   ``(value, count)`` histograms of the integer key, merged via
   sketch.sparse_int_histogram (driver merge below its partial-row
   threshold, keyed-partition exchange above — volume O(distinct keys)
   either way; a measurement key like a document length has a tiny
   domain at any corpus size). From the merged histogram the driver
   derives BOTH the P-1 range boundaries (balanced cut ranks
   ``ceil(i*N/P)``) AND the exact row count of every range — so no
   separate counting pass is needed and the per-partition rank offsets
   are exact, not sampled.
2. **range exchange**: each row routes to ``searchsorted(boundaries,
   key)`` — all rows of an equal key land in ONE partition (required for
   exact tie ranking by id) — then each partition lexsorts by (key, id)
   and emits ``offset[pid] + local_index + 1``.

Nothing row-sized ever visits the driver (boundaries and offsets are
P-sized int64 arrays). Skew bound: one partition holds all rows of its
key range; a single key holding most of the table degenerates to one
shard — the same contract as any range-partitioned sort. ``descending``
ranks by (key DESC, id ASC) via int64 negation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.sketch import sparse_int_histogram

DEFAULT_RANK_PARTITIONS = 64


def global_rank(
    ds,
    *,
    key_col: str,
    id_col: str,
    partitions: int = DEFAULT_RANK_PARTITIONS,
    descending: bool = False,
    out_col: str = "rank",
):
    """Append ``out_col`` = exact global ROW_NUMBER under
    (key_col asc|desc, id_col asc). ``key_col`` must be integer-valued
    (cast floats/timestamps upstream); ``id_col`` must be a unique int64
    tie-breaker so the order is total."""
    sign = -1 if descending else 1

    def negate(t: pa.Table) -> pa.Table:
        v = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({key_col: pa.array(sign * v, pa.int64())})

    merged = sparse_int_histogram(
        ds.map_batches(negate, batch_format="pyarrow"), col=key_col
    )
    if merged.empty:
        return ds.map_batches(
            lambda t: t.append_column(
                out_col, pa.array(np.empty(t.num_rows, np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        )
    values = merged["v"].to_numpy(np.int64)  # sorted by the histogram helper
    cum = np.cumsum(merged["n"].to_numpy(np.int64))
    total = int(cum[-1])

    # balanced cut values at ranks ceil(i*N/P); equal cuts collapse (a hot
    # key spanning several cut ranks keeps its whole range in one shard)
    cut_ranks = np.ceil(np.arange(1, partitions) * total / partitions)
    bvals = np.unique(values[np.searchsorted(cum, cut_ranks, side="left")])
    # exact rows per range from the same histogram -> exclusive offsets
    pid_of_value = np.searchsorted(bvals, values, side="left")
    counts = np.bincount(
        pid_of_value, weights=merged["n"].to_numpy(np.int64),
        minlength=len(bvals) + 1,
    ).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    def tag(t: pa.Table) -> pa.Table:
        v = sign * t.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        pid = np.searchsorted(bvals, v, side="left").astype(np.int64)
        return t.append_column("_pid", pa.array(pid, pa.int64()))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["_pid"].iloc[0])
        g = g.drop(columns="_pid")
        v = sign * g[key_col].to_numpy(np.int64)
        i = g[id_col].to_numpy(np.int64)
        order = np.lexsort((i, v))
        out = g.iloc[order].reset_index(drop=True)
        out[out_col] = offsets[pid] + np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_pid")
        .map_groups(rank_part, batch_format="pandas")
    )


def global_ntile_agg(
    ds,
    *,
    key_col: str,
    id_col: str,
    tiles: int,
    agg_col: str | None = None,
    partitions: int = DEFAULT_RANK_PARTITIONS,
):
    """(``tiles >= 1``; ``agg_col`` must be integer-valued — the same
    exact-int64 contract as global_rank / keyed_window_functions.)

    Global equi-depth bucketing + per-bucket aggregate: assign every
    row its NTILE(tiles) OVER (ORDER BY key_col, id_col) — the decile /
    percentile-cohort analysis primitive — and return one row per tile
    with (tile, n_rows, sum_<agg>). NTILE semantics match SQL exactly:
    with N rows the first N % tiles tiles hold ceil(N/tiles) rows, the
    rest floor(N/tiles).

    Distributed shape: :func:`global_rank` (histogram pass + exact range
    exchange, nothing row-sized on the driver) gives each row its exact
    1-based global position; the tile is then a pure per-row integer
    formula, and the aggregate is map-side partials into a tiles-sized
    keyed merge. One extra column-pruned count pass supplies N.
    """
    from abwcf_ray.stages.dedup import keyed_hash_agg

    if tiles < 1:
        raise ValueError("tiles must be >= 1")
    N = ds.count()
    size_small = N // tiles
    n_big = N % tiles
    cutoff = n_big * (size_small + 1)

    ranked = global_rank(
        ds, key_col=key_col, id_col=id_col, partitions=partitions
    )
    sum_col = f"sum_{agg_col}" if agg_col else f"sum_{key_col}"
    vcol = agg_col or key_col

    def partial(t: pa.Table) -> pa.Table:
        r0 = t.column("rank").to_numpy(zero_copy_only=False).astype(np.int64) - 1
        if size_small == 0:
            tile = r0 + 1  # N < tiles: one row per tile
        else:
            tile = np.where(
                r0 < cutoff,
                r0 // (size_small + 1),
                n_big + (r0 - cutoff) // size_small,
            ) + 1
        v = t.column(vcol).to_numpy(zero_copy_only=False).astype(np.int64)
        pdf = pd.DataFrame({"tile": tile.astype(np.int64), "v": v})
        g = pdf.groupby("tile", as_index=False, sort=False).agg(
            n_rows=("v", "size"), s=("v", "sum")
        )
        g["n_rows"] = g["n_rows"].astype(np.int64)
        g["s"] = g["s"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("tile", as_index=False, sort=False).agg(
            n_rows=("n_rows", "sum"), s=("s", "sum")
        )
        out = pd.DataFrame(
            {
                "tile": m["tile"].astype(np.int64),
                "n_rows": m["n_rows"].astype(np.int64),
                sum_col: m["s"].astype(np.int64),
            }
        )
        return out

    return keyed_hash_agg(
        ranked.map_batches(partial, batch_format="pyarrow"),
        lambda b: b.column("tile").to_numpy(zero_copy_only=False).astype(np.int64),
        merge,
        partitions=min(8, tiles),
    )
