"""Deterministic sampling stages for training-data curation.

Large-scale corpus curation needs *reproducible* sampling: per-stratum
rates (downsample an over-represented language or source) and exact
per-stratum quotas (budgeted data mixtures). Both operators key on a Knuth
multiplicative hash of the integer id column — deterministic across runs,
block layouts, and cluster sizes, uniform over ids, and exactly
reproducible in ANSI SQL (``(doc_id * 2654435761) % 2^32``), so both carry
a DuckDB value oracle in ``__ray_entry__``.

Scale notes:

- :func:`sample_by_rate` is shuffle-FREE — a pure vectorized row filter
  (``key < rate * 2^32``); at 100 TB it runs entirely map-side.
- :func:`stratified_sample` reuses the scheduler's two-level exact top-k
  shape (``stages/schedule.py``, D1): every block first prunes itself to
  ≤ quota rows per stratum (vectorized sort + cumcount — a superset of the
  block's contribution to the global answer), then an exact
  hash(stratum)-sharded merge runs one vectorized top-k per shard. The
  full table never crosses an exchange, and a heavy stratum never
  materializes as a single group — each block caps it at quota rows before
  any data moves. Partials are merged on the driver only while they are
  provably small (≤ quota × strata × blocks rows, with a size threshold);
  above it the merge is a distributed ``groupby(pkey).map_groups``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1) << np.uint64(32)


def sample_key(ids: np.ndarray) -> np.ndarray:
    """uint64 Knuth multiplicative sampling key, ``(id * 2654435761) mod 2^32``
    — identical to the SQL expression ``(id * 2654435761) % 4294967296`` for
    non-negative ids (uint64 wraparound cannot occur below the mod)."""
    return (ids.astype(np.uint64) * _KNUTH) % _MOD32


def sample_by_rate(ds, rate, id_col: str = "doc_id", strata_col: str | None = None):
    """Deterministic hash sampling: keep rows whose sample key falls below
    ``rate * 2^32``. ``rate`` is a float, or — with ``strata_col`` — a dict
    ``stratum -> rate`` (unlisted strata keep everything, rate 1.0).

    A pure row filter: no shuffle, no state, exact under retries."""
    if isinstance(rate, dict) and strata_col is None:
        raise ValueError("per-stratum rates require strata_col")

    def keep(batch: pa.Table) -> pa.Table:
        key = sample_key(batch.column(id_col).to_numpy(zero_copy_only=False))
        if isinstance(rate, dict):
            strata = batch.column(strata_col).to_pandas()
            thr = strata.map(rate).fillna(1.0).to_numpy(dtype=np.float64)
        else:
            thr = float(rate)
        return batch.filter(pa.array(key < np.uint64(1 << 32) * thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def _topq(
    t: pa.Table, quota, strata_col: str, id_col: str, keep_key: bool
) -> pa.Table:
    """Exact per-stratum top-``quota`` of one table by (sample key asc,
    id asc) — vectorized (one polars sort + int_range over stratum), no
    per-stratum Python. ``quota`` is an int or a dict ``stratum -> int``
    (unlisted strata keep 0 rows: an explicit mixture is a whitelist)."""
    if t.num_rows == 0:
        if keep_key and "_skey" not in t.column_names:
            t = t.append_column("_skey", pa.array([], pa.uint64()))
        elif not keep_key and "_skey" in t.column_names:
            t = t.drop_columns(["_skey"])
        return t
    import polars as pl

    if "_skey" not in t.column_names:
        key = sample_key(t.column(id_col).to_numpy(zero_copy_only=False))
        t = t.append_column("_skey", pa.array(key, pa.uint64()))
    ldf = (
        pl.from_arrow(t)
        .sort([strata_col, "_skey", id_col])
        .with_columns(pl.int_range(pl.len()).over(strata_col).alias("_r"))
    )
    if isinstance(quota, dict):
        q = pl.col(strata_col).replace_strict(quota, default=0)
    else:
        q = pl.lit(int(quota))
    out = ldf.filter(pl.col("_r") < q).drop(["_r"]).to_arrow().cast(t.schema)
    return out if keep_key else out.drop_columns(["_skey"])


def stratified_sample(
    ds,
    quota,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    merge_partitions: int = 16,
    driver_merge_max_rows: int = 200_000,
):
    """Exact per-stratum quota sample: for each stratum keep the ``quota``
    rows with the smallest (sample key, id) — a deterministic uniform
    subset, independent of block layout and cluster size.

    Two levels, mirroring ``schedule.select_wave``: per-block partial
    top-quota (map-side prune), then an exact merge. The merge runs on the
    driver while the partial bound (quota × strata seen) is small, else as
    a hash(stratum)-sharded ``map_groups`` so every stratum lands wholly in
    one shard and the driver never holds the partials."""
    from abwcf_ray.functions.hashing import hash64

    # partials are materialized ONCE (object store, spillable) so the
    # regime gate reads their ACTUAL row count: a quota-derived bound
    # only caps the FINAL result, not (bound-per-block x n_blocks) — the
    # volume the driver would really pull (the sparse_int_histogram
    # regime-split pattern)
    partials = ds.map_batches(
        lambda b: _topq(b, quota, strata_col, id_col, keep_key=True),
        batch_format="pyarrow",
    ).materialize()
    small = partials.count() <= driver_merge_max_rows
    if small:
        import ray
        import ray.data as rd

        tables = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
        if not tables:
            return _strip_key(partials)
        allt = pa.concat_tables([t.cast(tables[0].schema) for t in tables])
        return rd.from_arrow(_topq(allt, quota, strata_col, id_col, keep_key=False))

    def add_pkey(t: pa.Table) -> pa.Table:
        pkey = (hash64(t.column(strata_col)) % np.uint64(merge_partitions)).astype(
            np.int64
        )
        return t.append_column("_pkey", pa.array(pkey, pa.int64()))

    def merge(g: pa.Table) -> pa.Table:
        return _topq(
            g.drop_columns(["_pkey"]), quota, strata_col, id_col, keep_key=False
        )

    return (
        partials.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pyarrow")
    )


def _topg(
    t: pa.Table,
    k: int,
    group_col: str,
    score_col,
    id_col: str,
    descending,
) -> pa.Table:
    """Exact per-group top-``k`` of one table by (score..., id asc) —
    vectorized (one polars sort + int_range over group), no per-group
    Python. ``score_col`` may be one column or an ordered list of sort
    keys (``descending`` a bool or a matching list) — a full multi-key
    ``ORDER BY ... LIMIT k``. Ties break on ascending id, so the result
    is deterministic and exactly mirrors ``row_number() OVER (PARTITION
    BY g ORDER BY score... [DESC], id)``."""
    if t.num_rows == 0:
        return t
    import polars as pl

    scores = [score_col] if isinstance(score_col, str) else list(score_col)
    desc = (
        [descending] * len(scores)
        if isinstance(descending, bool)
        else list(descending)
    )
    out = (
        pl.from_arrow(t)
        .sort(
            [group_col, *scores, id_col],
            descending=[False, *desc, False],
        )
        .with_columns(pl.int_range(pl.len()).over(group_col).alias("_r"))
        .filter(pl.col("_r") < int(k))
        .drop(["_r"])
        .to_arrow()
    )
    return out.cast(t.schema)


def topk_per_group(
    ds,
    k: int,
    *,
    group_col: str,
    score_col: str | list[str],
    id_col: str = "doc_id",
    descending: bool | list[bool] = True,
    merge_partitions: int = 16,
):
    """Exact top-``k`` rows per group ranked by (score..., id) — e.g. the
    best-quality documents per host, the per-domain representative pick.
    ``score_col``/``descending`` accept ordered lists for a multi-key
    ``ORDER BY a DESC, b ASC, ... LIMIT k`` (pruning by the same
    lexicographic order the merge uses stays exact).

    Same two-level shape as :func:`stratified_sample` (and the frontier
    scheduler's D1 top-k): every block prunes itself to <= k rows per
    group (a superset of its contribution to the global answer — pruning
    by the SAME total order the merge uses is exact), then one
    ``hash(group) % merge_partitions`` keyed exchange lands each group
    wholly in one shard for the final vectorized top-k. The full table
    never crosses the exchange and a hot group never materializes beyond
    k rows per block; no driver materialization on any path."""
    from abwcf_ray.functions.hashing import hash64

    partials = ds.map_batches(
        lambda b: _topg(b, k, group_col, score_col, id_col, descending),
        batch_format="pyarrow",
    )

    def add_pkey(t: pa.Table) -> pa.Table:
        col = t.column(group_col)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            key = hash64(col)
        else:
            key = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        pkey = (key % np.uint64(merge_partitions)).astype(np.int64)
        return t.append_column("_pkey", pa.array(pkey, pa.int64()))

    def merge(g: pa.Table) -> pa.Table:
        return _topg(
            g.drop_columns(["_pkey"]), k, group_col, score_col, id_col, descending
        )

    return (
        partials.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pyarrow")
    )


def replicate_by_weight(
    ds, weights: dict, strata_col: str = "lang", id_col: str = "doc_id"
):
    """Deterministic epoch replication for training-data mixtures (the
    "source weights / epochs" step of LLM mixes): a row whose stratum has
    weight ``w`` is emitted ``floor(w)`` times, plus once more iff its
    Knuth key falls below ``frac(w) * 2^32`` — so a stratum's expected
    multiplicity is exactly ``w``, reproducibly (same doc always gets the
    same copy count, independent of layout/cluster size). Strata absent
    from ``weights`` keep weight 1.0. Adds an ``epoch`` column (0-based
    copy index).

    Pure map-side flat-map: vectorized ``np.repeat`` over arrow take
    indices, no shuffle, exact under retries."""

    def expand(batch: pa.Table) -> pa.Table:
        key = sample_key(batch.column(id_col).to_numpy(zero_copy_only=False))
        strata = batch.column(strata_col).to_pandas()
        w = strata.map(weights).fillna(1.0).to_numpy(dtype=np.float64)
        base = np.floor(w)
        extra = key < (w - base) * float(1 << 32)
        copies = (base + extra).astype(np.int64)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), copies)
        out = batch.take(pa.array(idx))
        total = int(copies.sum())
        starts = np.concatenate([[0], np.cumsum(copies)])[:-1]
        epoch = np.arange(total, dtype=np.int64) - np.repeat(starts, copies)
        return out.append_column("epoch", pa.array(epoch, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def _strip_key(ds):
    return ds.map_batches(
        lambda t: t.drop_columns(["_skey"]) if "_skey" in t.column_names else t,
        batch_format="pyarrow",
    )
