"""Generic distributed hash equi-join.

Ray Data (2.49) has no native join operator; the repo's temporal joins
(stages/asof.py) built their own keyed exchanges. This stage is the plain
equi-join counterpart, with the two regimes every distributed engine
offers:

- **broadcast** (default while the build side fits
  ``broadcast_max_rows``): the right side is materialized ONCE, pushed to
  the object store with ``ray.put``, and every left batch probes it with
  one vectorized pandas merge — zero shuffle, the 100-TB-scale shape for
  dimension-table joins (customer, hosts, language lookup...). The
  broadcast payload is read zero-copy per node, never re-shipped per
  batch.
- **bucketed** (the big-big path): both sides are tagged and hash(key)-
  partitioned into ``partitions`` buckets with ONE union + ONE keyed
  exchange; each bucket merges its two sides with one vectorized pandas
  merge. No group ever sees more than its key range; skew is bounded by
  the hash, and nothing materializes on the driver.

Column collisions resolve pandas-style: non-key right columns that clash
with left names get ``suffix``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_JOIN_PARTITIONS = 32


def _arrow_type(t) -> pa.DataType:
    """Ray's Schema.types yields the Python ``object`` class (not an arrow
    type) for string columns held in pandas blocks — normalize those."""
    if isinstance(t, pa.DataType):
        return t
    return pa.string()


def _pd_dtype(t) -> object:
    return _arrow_type(t).to_pandas_dtype()


def _key_u64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    from abwcf_ray.functions.hashing import hash64

    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash64(col)
    return col.to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)


def equi_join(
    left,
    right,
    *,
    on: str,
    how: str = "inner",
    broadcast_max_rows: int = 2_000_000,
    partitions: int = DEFAULT_JOIN_PARTITIONS,
    suffix: str = "_r",
):
    """Join two Datasets on one key column. ``how`` is ``inner`` or
    ``left``. Output column order: all left columns, then right non-key
    columns (suffixed on clash). Row multiplicity matches SQL join
    semantics exactly (duplicate keys multiply)."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")

    rschema = right.schema()
    lschema_w = left.schema()
    rnames = list(rschema.names)
    lnames = list(lschema_w.names)
    rtype = {c: _arrow_type(t) for c, t in zip(rschema.names, rschema.types)}
    ltype = {c: _arrow_type(t) for c, t in zip(lschema_w.names, lschema_w.types)}
    ren = {
        c: (c + suffix if (c in lnames and c != on) else c)
        for c in rnames
    }

    n_right = right.count()
    if n_right <= broadcast_max_rows:
        import ray

        tables = [t for t in ray.get(right.to_arrow_refs()) if t.num_rows]
        rt = (
            pa.concat_tables(tables)
            if tables
            else pa.schema([pa.field(c, rtype[c]) for c in rnames]).empty_table()
        )
        rdf = rt.to_pandas().rename(columns=ren)
        rref = ray.put(rdf)

        def probe(batch: pd.DataFrame) -> pd.DataFrame:
            build = ray.get(rref)  # zero-copy per node after first fetch
            return batch.merge(build, on=on, how=how, sort=False)

        return left.map_batches(probe, batch_format="pandas")

    # -- bucketed big-big path -------------------------------------------
    # one union + one keyed exchange; each side fills the other's columns
    # with nulls (arrow validity bitmaps — cheap) so schemas unify
    out_right = [ren[c] for c in rnames if c != on]

    ren_inv = {v: k for k, v in ren.items()}

    # canonical unified column order (union requires identical schemas):
    # left columns, right non-key columns (renamed), _pkey, _side
    def tag_left(t: pa.Table) -> pa.Table:
        pkey = (_key_u64(t.column(on)) % np.uint64(partitions)).astype(np.int64)
        cols = {c: t.column(c) for c in lnames}
        for c in out_right:
            cols[c] = pa.nulls(t.num_rows, rtype[ren_inv[c]])
        cols["_pkey"] = pa.array(pkey, pa.int64())
        cols["_side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.rename_columns([ren[c] for c in t.column_names])
        pkey = (_key_u64(t.column(on)) % np.uint64(partitions)).astype(np.int64)
        cols = {
            c: (t.column(on) if c == on else pa.nulls(t.num_rows, ltype[c]))
            for c in lnames
        }
        for c in out_right:
            cols[c] = t.column(c)
        cols["_pkey"] = pa.array(pkey, pa.int64())
        cols["_side"] = pa.array(np.ones(t.num_rows, np.int8))
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    # the union's null-filled slots widen int64 -> float64 in pandas groups;
    # once split by _side each part is null-free again — cast back to the
    # source dtypes so join keys and values stay exact
    ldtypes = {c: _pd_dtype(ltype[c]) for c in lnames}
    rdtypes = {on: _pd_dtype(ltype[on])}
    rdtypes.update({c: _pd_dtype(rtype[ren_inv[c]]) for c in out_right})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["_side"] == 0]
        ri = g[g["_side"] == 1]
        lpart = li[lnames].astype(ldtypes)
        rpart = ri[[on] + out_right].astype(rdtypes)
        out = lpart.merge(rpart, on=on, how=how, sort=False, suffixes=("", suffix))
        return out

    return (
        lt.union(rt)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )
