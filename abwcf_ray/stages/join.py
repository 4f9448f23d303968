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
with left names get ``suffix``. Keys may be composite (``on`` as a list;
the bucketed partition key folds per-column hashes). ``how`` covers
inner / left / full outer; outer always runs bucketed (see equi_join).
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


def _cast_exact(df: pd.DataFrame, names, arrow_types) -> pd.DataFrame:
    """Cast back to source dtypes after a null-widening union/merge. Integer
    columns that picked up nulls go to pandas NULLABLE ints (Int64/...), so
    values stay exact and the nulls survive the arrow round-trip instead of
    exploding on a float64 -> int64 astype."""
    cols = {}
    for c in names:
        t = arrow_types[c]
        s = df[c]
        if pa.types.is_integer(t) and s.isna().any():
            pre = "UInt" if pa.types.is_unsigned_integer(t) else "Int"
            cols[c] = s.astype(f"{pre}{t.bit_width}")
        else:
            cols[c] = s.astype(_pd_dtype(t))
    return pd.DataFrame(cols)


def _nullsafe_pdf(t: pa.Table) -> pd.DataFrame:
    """arrow -> pandas with int64 columns as NULLABLE Int64: the tagged
    union pads each side's missing columns with nulls, and a plain pandas
    conversion would decay those int64 columns to float64 — rounding
    values above 2^53 for ALL rows (the asof.py hazard). Same helper
    contract as stages/asof._nullsafe_pdf."""
    return t.to_pandas(
        types_mapper=lambda dt: pd.Int64Dtype() if dt == pa.int64() else None
    )


def _key_u64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    from abwcf_ray.functions.hashing import hash64

    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash64(col)
    # Fibonacci mix (dedup._int_pkey's) so stride-aligned integer key
    # domains (sharded id allocators, second-aligned timestamps) don't
    # collapse into one bucket under `% partitions`
    v = col.to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
    return (v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(13)


def _keys_u64(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Composite 64-bit key hash: fold per-column hashes with the golden-
    ratio mix (order-sensitive, so (a, b) != (b, a))."""
    h = _key_u64(t.column(keys[0]))
    for c in keys[1:]:
        h = h * np.uint64(0x9E3779B97F4A7C15) ^ _key_u64(t.column(c))
    return h


def equi_join(
    left,
    right,
    *,
    on: str | list[str],
    how: str = "inner",
    broadcast_max_rows: int = 2_000_000,
    partitions: int = DEFAULT_JOIN_PARTITIONS,
    suffix: str = "_r",
):
    """Join two Datasets on one or more key columns. ``how`` is ``inner``,
    ``left``, or ``outer`` (FULL OUTER). Output column order: all left
    columns, then right non-key columns (suffixed on clash). Row
    multiplicity matches SQL join semantics exactly (duplicate keys
    multiply).

    ``outer`` always takes the bucketed path: the broadcast probe sees the
    build side once PER LEFT BATCH, so it cannot emit each unmatched right
    row exactly once — the keyed exchange can, because every key lives in
    exactly one bucket."""
    if how not in ("inner", "left", "outer"):
        raise ValueError(f"unsupported how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    rschema = right.schema()
    lschema_w = left.schema()
    rnames = list(rschema.names)
    lnames = list(lschema_w.names)
    rtype = {c: _arrow_type(t) for c, t in zip(rschema.names, rschema.types)}
    ltype = {c: _arrow_type(t) for c, t in zip(lschema_w.names, lschema_w.types)}
    ren = {
        c: (c + suffix if (c in lnames and c not in keys) else c)
        for c in rnames
    }

    if how != "outer" and right.count() <= broadcast_max_rows:
        import ray

        tables = [t for t in ray.get(right.to_arrow_refs()) if t.num_rows]
        rt = (
            pa.concat_tables(tables)
            if tables
            else pa.schema([pa.field(c, rtype[c]) for c in rnames]).empty_table()
        )
        # nullable-Int64 conversion keeps right int64 columns exact, and
        # SQL NULL-key semantics: null-key build rows can never match —
        # drop them up front (a pandas merge would pair NA keys)
        rdf = _nullsafe_pdf(rt).rename(columns=ren)
        rdf = rdf[~rdf[keys].isna().any(axis=1)]
        rref = ray.put(rdf)
        latypes = {c: ltype[c] for c in lnames}
        rotypes = {ren[c]: rtype[c] for c in rnames if c not in keys}

        def probe(batch: pa.Table) -> pd.DataFrame:
            build = ray.get(rref)  # zero-copy per node after first fetch
            out = _nullsafe_pdf(batch).merge(
                build, on=keys, how=how, sort=False
            )
            # normalize dtypes so matched-only and partly-unmatched
            # batches emit ONE schema (nullable ints, no float decay)
            return _cast_exact(out, list(out.columns), {**latypes, **rotypes})

        return left.map_batches(probe, batch_format="pyarrow")

    # -- bucketed big-big path -------------------------------------------
    # one union + one keyed exchange; each side fills the other's columns
    # with nulls (arrow validity bitmaps — cheap) so schemas unify
    out_right = [ren[c] for c in rnames if c not in keys]

    ren_inv = {v: k for k, v in ren.items()}

    # canonical unified column order (union requires identical schemas):
    # left columns, right non-key columns (renamed), _pkey, _side
    def tag_left(t: pa.Table) -> pa.Table:
        pkey = (_keys_u64(t, keys) % np.uint64(partitions)).astype(np.int64)
        cols = {c: t.column(c) for c in lnames}
        for c in out_right:
            cols[c] = pa.nulls(t.num_rows, rtype[ren_inv[c]])
        cols["_pkey"] = pa.array(pkey, pa.int64())
        cols["_side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.rename_columns([ren[c] for c in t.column_names])
        pkey = (_keys_u64(t, keys) % np.uint64(partitions)).astype(np.int64)
        cols = {
            c: (t.column(c) if c in keys else pa.nulls(t.num_rows, ltype[c]))
            for c in lnames
        }
        for c in out_right:
            cols[c] = t.column(c)
        cols["_pkey"] = pa.array(pkey, pa.int64())
        cols["_side"] = pa.array(np.ones(t.num_rows, np.int8))
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    # int64 columns cross the null-padded union as NULLABLE Int64 (see
    # _nullsafe_pdf — a plain pandas conversion would round them above
    # 2^53 before any cast-back could save them), then _cast_exact only
    # normalizes the remaining dtypes
    latypes = {c: ltype[c] for c in lnames}
    ratypes = {c: ltype[c] for c in keys}
    ratypes.update({c: rtype[ren_inv[c]] for c in out_right})

    def merge(t: pa.Table) -> pd.DataFrame:
        g = _nullsafe_pdf(t)
        side = g["_side"].to_numpy()
        li = g[side == 0]
        ri = g[side == 1]
        # SQL NULL-key semantics: a NULL key matches NOTHING (pandas
        # merge would pair NaN/NA keys) — split null-key rows out and
        # re-emit them as unmatched under left/outer
        lkey_null = li[keys].isna().any(axis=1)
        rkey_null = ri[keys].isna().any(axis=1)
        lpart = _cast_exact(li[~lkey_null], lnames, latypes)
        rpart = _cast_exact(
            ri[~rkey_null], keys + out_right, ratypes
        )
        out = lpart.merge(rpart, on=keys, how=how, sort=False, suffixes=("", suffix))
        parts = [out]
        if how != "inner" and lkey_null.any():
            parts.append(li[lkey_null][lnames])  # right cols re-added below
        if how == "outer" and rkey_null.any():
            parts.append(ri[rkey_null][keys + out_right])
        if len(parts) > 1:
            out = pd.concat(parts, ignore_index=True)
        if how != "inner":  # unmatched-side ints: keep exact + nullable
            out = _cast_exact(out, list(out.columns), {**latypes, **ratypes})
        return out[lnames + out_right]

    return (
        lt.union(rt)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Semi / anti membership joins (the decontamination shape: keep/drop left
# rows by key presence on the right, output = left columns only, never
# duplicated). NULL keys follow SQL EXISTS semantics: a NULL key matches
# nothing (dropped by semi, kept by anti).
# ---------------------------------------------------------------------------

_BLOOM_K = 4  # double-hashing probes per key


def _bloom_params(n_keys: int, bits_per_key: int) -> int:
    m = 1 << max(10, int(np.ceil(np.log2(max(1, n_keys) * bits_per_key))))
    return m


def _bloom_positions(h: np.ndarray, m: int) -> np.ndarray:
    """(n, _BLOOM_K) bit positions via double hashing — h1 + i*h2 mod m
    (m is a power of two; h2 forced odd so the stride cycles)."""
    h1 = h
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    i = np.arange(_BLOOM_K, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)


def _bloom_build(right, key: str, m: int) -> np.ndarray:
    """Distributed bloom build: each block folds its keys into an m-bit
    word-array partial; the driver ORs the fixed-size partials (m/8 bytes
    each — independent of row count)."""
    words = m // 64

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(key)
        if col.null_count:
            col = col.drop_null()
        bm = np.zeros(words, np.uint64)
        if len(col):
            pos = _bloom_positions(_key_u64(col), m).ravel()
            np.bitwise_or.at(bm, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.large_binary())})

    out = np.zeros(words, np.uint64)
    for row in right.map_batches(partial, batch_format="pyarrow").take_all():
        out |= np.frombuffer(row["bm"], np.uint64)
    return out


def _bloom_probe(bm: np.ndarray, m: int, col: pa.ChunkedArray) -> np.ndarray:
    """Boolean maybe-present mask per value (nulls -> False)."""
    n = len(col)
    valid = np.ones(n, bool)
    if col.null_count:
        valid = ~col.is_null().to_numpy(zero_copy_only=False)
    maybe = np.zeros(n, bool)
    if valid.any():
        pos = _bloom_positions(_key_u64(col.drop_null()), m)
        hit = (
            (bm[(pos >> np.uint64(6)).astype(np.int64)]
             >> (pos & np.uint64(63))) & np.uint64(1)
        ).astype(bool).all(axis=1)
        maybe[valid] = hit
    return maybe


def semi_join(left, right, *, on: str, anti: bool = False,
              broadcast_max_rows: int = 8_000_000,
              partitions: int = DEFAULT_JOIN_PARTITIONS,
              bloom_bits_per_key: int = 12):
    """Semi (``anti=False``) or anti (``anti=True``) join on one key.

    - **broadcast** (right row count <= ``broadcast_max_rows``): the right
      side's DISTINCT key hashes ship once via ``ray.put`` (8 B/key) and
      every left batch filters map-side with one sorted-array membership
      test — zero shuffle. Hash collisions (64-bit, ~n^2/2^65) are accepted
      and documented; use the bucketed path for exact-by-construction.
    - **bloom + bucketed exact** (the big-big path): a distributed bloom
      build (fixed-size partials OR-ed on the driver) prunes left rows
      map-side first — definite-absent rows are emitted immediately (anti)
      or dropped (semi) WITHOUT ever entering the exchange — then only the
      bloom-positive residue and the right keys go through one
      hash(key)-partitioned exchange for an exact per-bucket verify. Output
      is exact; the bloom only reduces shuffle volume (false-positive rate
      ~0.6% at 12 bits/key, k=4).
    """
    lnames = list(left.schema().names)
    n_right = right.count()

    if n_right <= broadcast_max_rows:
        import ray

        keys = np.unique(
            np.concatenate(
                [
                    _key_u64(t.column(on).drop_null())
                    for t in ray.get(right.select_columns([on]).to_arrow_refs())
                    if t.num_rows
                ]
                or [np.empty(0, np.uint64)]
            )
        )
        kref = ray.put(keys)

        def probe(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            col = t.column(on)
            mask = np.zeros(t.num_rows, bool)
            valid = np.ones(t.num_rows, bool)
            if col.null_count:
                valid = ~col.is_null().to_numpy(zero_copy_only=False)
            if valid.any() and len(ks):
                h = _key_u64(col.drop_null())
                idx = np.searchsorted(ks, h)
                idx[idx == len(ks)] = 0
                mask[valid] = ks[idx] == h
            keep = ~mask if anti else mask
            return t.filter(pa.array(keep))

        return left.map_batches(probe, batch_format="pyarrow")

    # -- bloom prune + bucketed exact verify -------------------------------
    import ray

    m = _bloom_params(n_right, bloom_bits_per_key)
    bm = _bloom_build(right, on, m)
    bref = ray.put(bm)

    def split(t: pa.Table, want_maybe: bool) -> pa.Table:
        maybe = _bloom_probe(ray.get(bref), m, t.column(on))
        return t.filter(pa.array(maybe if want_maybe else ~maybe))

    definite = left.map_batches(
        lambda t: split(t, False), batch_format="pyarrow"
    )  # bloom says absent -> exact: no match
    residue = left.map_batches(lambda t: split(t, True), batch_format="pyarrow")

    ltype = {c: _arrow_type(t)
             for c, t in zip(left.schema().names, left.schema().types)}

    def tag_l(t: pa.Table) -> pa.Table:
        col = t.column(on)
        pkey = np.zeros(t.num_rows, np.int64)  # null keys -> bucket 0
        if col.null_count:
            valid = ~col.is_null().to_numpy(zero_copy_only=False)
            pkey[valid] = (
                _key_u64(col.drop_null()) % np.uint64(partitions)
            ).astype(np.int64)
        else:
            pkey = (_key_u64(col) % np.uint64(partitions)).astype(np.int64)
        cols = {c: t.column(c) for c in lnames}
        cols["_pkey"] = pa.array(pkey, pa.int64())
        cols["_side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def tag_r(t: pa.Table) -> pa.Table:
        col = t.column(on).drop_null()
        pkey = (_key_u64(col) % np.uint64(partitions)).astype(np.int64)
        cols = {
            c: (col if c == on else pa.nulls(len(col), ltype[c]))
            for c in lnames
        }
        cols["_pkey"] = pa.array(pkey, pa.int64())
        cols["_side"] = pa.array(np.ones(len(col), np.int8))
        return pa.table(cols)

    def verify(t: pa.Table) -> pd.DataFrame:
        # nullsafe: right rows pad the left payload columns with nulls —
        # int64 payloads must not decay to float64 (see _nullsafe_pdf)
        g = _nullsafe_pdf(t)
        li = g[g["_side"] == 0]
        rkeys = g.loc[g["_side"] == 1, on].unique()
        mask = li[on].isin(rkeys) & li[on].notna()
        keep = li[~mask if anti else mask]
        return _cast_exact(keep, lnames, ltype)

    checked = (
        residue.map_batches(tag_l, batch_format="pyarrow")
        .union(
            right.select_columns([on]).map_batches(tag_r, batch_format="pyarrow")
        )
        .groupby("_pkey")
        .map_groups(verify, batch_format="pyarrow")
    )
    return definite.union(checked) if anti else checked


def anti_join(left, right, *, on: str, **kw):
    """Left rows with NO key match on the right (SQL ``NOT EXISTS``)."""
    return semi_join(left, right, on=on, anti=True, **kw)
