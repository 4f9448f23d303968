"""As-of (temporal) join — each left row picks the latest right row of the
same key with ``right.ts <= left.ts``.

The canonical event-stream enrichment operator (attribute every purchase
to the user's most recent click; join quotes onto trades). Ray Data has
no primitive for it; this implements the standard distributed shape:

- **Single-stage** (default): left and right rows meet in hash(key)
  partitions (one exchange) and each partition runs ONE vectorized
  ``pd.merge_asof`` (a C kernel — no per-row Python). Partitioning
  assumption, stated per the build brief: all rows of one key fit one
  partition — true whenever no single key dominates the stream.

- **Skew-safe two-stage** (``bucket_span_us`` set): the session-window
  trick (``stages/windows.py``) adapted to as-of. Rows partition by
  hash(key, ts // bucket_span) so a hot key splits across time buckets;
  exactness is restored by CARRY-IN rows. Stage 1 reduces the right
  stream to one latest-row summary per (key, bucket) — map-side partial
  latest per batch, then a keyed merge whose input is the bounded
  summary set, never raw rows. Stage 2 groups summaries (plus the set
  of buckets holding left rows) per key and emits, for every bucket,
  the latest right row of any STRICTLY EARLIER bucket; these carry-ins
  union with the raw rows into the (key, bucket)-partitioned join.
  Exchange overhead: one summary row per (key, non-empty bucket).

Both paths are exact and bit-identical (pytest pins parity on a hot-key
stream); the DuckDB oracle is the native ``ASOF LEFT JOIN``. ``matched``
flags rows with a join partner; unmatched payload is null (callers fill
a sentinel before hashing so integer payloads never decay to float).
Right payload columns must be non-null (the fixture's are) — ``matched``
is derived from the first payload column.

Reference anchor: the reference engine has no temporal join (it is a
crawler); this extends the streaming-semantics family (SURVEY.md §2 G)
the way the windowed aggregates do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import _int_pkey, keyed_hash_agg

ASOF_PARTITIONS = 64
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _ts_int(col) -> np.ndarray:
    return (
        col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if pa.types.is_timestamp(col.type)
        else col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    )


def _kb_pkey(key: np.ndarray, bucket: np.ndarray, partitions: int) -> np.ndarray:
    mix = key.astype(np.uint64) * _GOLD ^ bucket.astype(np.uint64)
    return ((mix >> np.uint64(13)) % np.uint64(partitions)).astype(np.int64)


def _arrow_types(ds) -> dict:
    """Column name -> arrow type of a Dataset (shared by asof_join and
    range_join_agg; empty/unknowable schemas yield {})."""
    schema = ds.schema(fetch_if_missing=True)
    base = schema.base_schema if schema is not None else None
    if base is None:  # empty dataset — types unknowable
        return {}
    if hasattr(base, "field"):  # pyarrow Schema
        return {f.name: f.type for f in base}
    # PandasBlockSchema (names + numpy dtypes)
    return {
        n: (pa.string() if t == object else pa.from_numpy_dtype(t))
        for n, t in zip(base.names, base.types)
    }


def _nullsafe_pdf(t: pa.Table) -> pd.DataFrame:
    """arrow -> pandas with int64 columns as NULLABLE Int64: columns that
    carry nulls from the tagged union would otherwise decay to float64
    and round int64 payloads above 2^53. Callers cast the structural
    non-null columns (_key/_ts/side/bucket) back to numpy int64."""
    return t.to_pandas(
        types_mapper=lambda dt: pd.Int64Dtype() if dt == pa.int64() else None
    )


def asof_join(
    left_ds,
    right_ds,
    *,
    key_col: str,
    ts_col: str,
    left_cols: list,
    payload_cols: list,
    suffix: str = "_r",
    partitions: int = ASOF_PARTITIONS,
    bucket_span_us: int | None = None,
):
    """Backward as-of join. Returns a Dataset with ``_key`` (int64 key),
    ``_ts`` (int64 µs), the extra ``left_cols``, suffixed
    ``payload_cols`` and ``matched`` (int64 0/1). Exact-equal timestamps
    join (DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).

    Contract: the right side must be UNIQUE on (key, ts) — with duplicate
    right timestamps the winning payload is row-order-dependent in BOTH
    regimes (pandas merge_asof keeps the last tied row in block order;
    the two-stage latest-summary keeps the last in partition order), so
    the result would vary with layout. Dedup the right side first (e.g.
    keep max by a deterministic tiebreak column)."""
    out_payload = [f"{c}{suffix}" for c in payload_cols]
    extra_left = [c for c in left_cols if c not in (key_col, ts_col)]

    lt_all = _arrow_types(left_ds)
    rt_all = _arrow_types(right_ds)
    # an empty/unknowable-schema left side joins nothing — float64 extra
    # columns are safe (same guard as payload_types for the right side)
    left_types = {c: lt_all.get(c, pa.float64()) for c in extra_left}
    # an empty right side joins nothing — null float64 payload is safe
    payload_types = {
        oc: rt_all.get(c, pa.float64()) for c, oc in zip(payload_cols, out_payload)
    }
    union_order = ["pkey", "bucket", "_key", "_ts", "side"] + extra_left + out_payload

    def base_cols(batch: pa.Table):
        key = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = _ts_int(batch.column(ts_col))
        if bucket_span_us:
            bucket = ts // bucket_span_us
            pkey = _kb_pkey(key, bucket, partitions)
        else:
            bucket = np.zeros(len(key), np.int64)
            pkey = _int_pkey(key, partitions)
        return key, ts, bucket, pkey

    def left_rows(batch: pa.Table) -> pa.Table:
        key, ts, bucket, pkey = base_cols(batch)
        n = batch.num_rows
        data = {
            "pkey": pa.array(pkey, pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
            "_key": pa.array(key, pa.int64()),
            "_ts": pa.array(ts, pa.int64()),
            "side": pa.array(np.zeros(n, np.int64), pa.int64()),
        }
        for c in extra_left:
            data[c] = batch.column(c)
        for oc in out_payload:
            data[oc] = pa.nulls(n, payload_types[oc])
        return pa.table(data).select(union_order)

    def right_rows(batch: pa.Table) -> pa.Table:
        key, ts, bucket, pkey = base_cols(batch)
        n = batch.num_rows
        data = {
            "pkey": pa.array(pkey, pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
            "_key": pa.array(key, pa.int64()),
            "_ts": pa.array(ts, pa.int64()),
            "side": pa.array(np.ones(n, np.int64), pa.int64()),
        }
        for c in extra_left:
            data[c] = pa.nulls(n, left_types[c])
        for c, oc in zip(payload_cols, out_payload):
            data[oc] = batch.column(c)
        return pa.table(data).select(union_order)

    tagged = left_ds.map_batches(left_rows, batch_format="pyarrow").union(
        right_ds.map_batches(right_rows, batch_format="pyarrow")
    )

    out_fields = (
        [("_key", pa.int64()), ("_ts", pa.int64())]
        + [(c, left_types[c]) for c in extra_left]
        + [(oc, payload_types[oc]) for oc in out_payload]
        + [("matched", pa.int64())]
    )

    def join_partition(t: pa.Table) -> pa.Table:
        # ARROW-NATIVE payload routing: the tagged union holds nulls in
        # payload/extra_left columns, and any pandas conversion of those
        # int64 columns decays them to float64 (rounding 64-bit ids above
        # 2^53 for ALL rows, matched included). merge_asof therefore sees
        # only the non-null structural columns plus ROW INDICES; payloads
        # are gathered arrow-side afterwards with pc.take + a null mask.
        import pyarrow.compute as pc

        side = t.column("side").to_numpy(zero_copy_only=False)
        lmask = side == 0
        lt_ = t.filter(pa.array(lmask))
        rt_ = t.filter(pa.array(~lmask))
        if lt_.num_rows == 0:
            return pa.schema(out_fields).empty_table()
        lts = lt_.column("_ts").to_numpy(zero_copy_only=False).astype(np.int64)
        lk = lt_.column("_key").to_numpy(zero_copy_only=False).astype(np.int64)
        lorder = np.argsort(lts, kind="stable")
        lfd = pd.DataFrame(
            {"_key": lk[lorder], "_ts": lts[lorder], "_li": lorder}
        )
        n = len(lfd)
        if rt_.num_rows:
            rts = (
                rt_.column("_ts").to_numpy(zero_copy_only=False).astype(np.int64)
            )
            rk = (
                rt_.column("_key").to_numpy(zero_copy_only=False).astype(np.int64)
            )
            rorder = np.argsort(rts, kind="stable")
            rfd = pd.DataFrame(
                {"_key": rk[rorder], "_ts": rts[rorder], "_ri": rorder}
            )
            j = pd.merge_asof(lfd, rfd, on="_ts", by="_key", direction="backward")
            ri = j["_ri"].to_numpy(np.float64)
        else:
            j = lfd
            ri = np.full(n, np.nan)
        li = pa.array(j["_li"].to_numpy(np.int64))
        matched = ~np.isnan(ri)
        data = {
            "_key": pc.take(lt_.column("_key"), li),
            "_ts": pc.take(lt_.column("_ts"), li),
        }
        for c in extra_left:
            data[c] = pc.take(lt_.column(c), li)
        m_arr = pa.array(matched)
        idx = pa.array(np.where(matched, ri, 0).astype(np.int64))
        for oc in out_payload:
            if rt_.num_rows:
                taken = pc.take(rt_.column(oc), idx)
                data[oc] = pc.if_else(
                    m_arr, taken, pa.scalar(None, payload_types[oc])
                )
            else:
                data[oc] = pa.nulls(n, payload_types[oc])
        data["matched"] = pa.array(matched.astype(np.int64), pa.int64())
        return pa.table(data)

    if not bucket_span_us:
        return tagged.groupby("pkey").map_groups(
            join_partition, batch_format="pyarrow"
        )

    # --- skew-safe two-stage ----------------------------------------------
    # stage 1: latest right row per (key, bucket) — map-side partial latest
    # per batch, keyed merge over SUMMARIES (bounded), never raw rows
    def right_partials(batch: pa.Table) -> pa.Table:
        key, ts, bucket, _ = base_cols(batch)
        df = pd.DataFrame({"_key": key, "bucket": bucket, "_ts": ts})
        for c, oc in zip(payload_cols, out_payload):
            df[oc] = batch.column(c).to_pandas()
        top = (
            df.sort_values("_ts", kind="mergesort")
            .groupby(["_key", "bucket"], as_index=False)
            .tail(1)
        )
        return pa.Table.from_pandas(top, preserve_index=False)

    def merge_latest(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values("_ts", kind="mergesort")
            .groupby(["_key", "bucket"], as_index=False)
            .tail(1)
        )

    summaries = keyed_hash_agg(
        right_ds.map_batches(right_partials, batch_format="pyarrow"),
        lambda b: b.column("_key").to_numpy(zero_copy_only=False),
        merge_latest,
        partitions=partitions,
    ).map_batches(
        lambda b: b.append_column(
            "is_left", pa.array(np.zeros(b.num_rows, np.int64), pa.int64())
        ),
        batch_format="pyarrow",
    )

    # buckets that hold LEFT rows (so carry-ins also reach buckets with no
    # right rows of their own) — per-batch distinct, keyed-merge distinct
    def left_bucket_partials(batch: pa.Table) -> pa.Table:
        key, ts, bucket, _ = base_cols(batch)
        df = pd.DataFrame({"_key": key, "bucket": bucket}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def pad_left_markers(b: pa.Table) -> pa.Table:
        n = b.num_rows
        t = b.append_column("_ts", pa.nulls(n, pa.int64()))
        for oc in out_payload:
            t = t.append_column(oc, pa.nulls(n, payload_types[oc]))
        return t.append_column(
            "is_left", pa.array(np.ones(n, np.int64), pa.int64())
        ).select(["_key", "bucket", "_ts"] + out_payload + ["is_left"])

    lmarkers = keyed_hash_agg(
        left_ds.map_batches(left_bucket_partials, batch_format="pyarrow"),
        lambda b: b.column("_key").to_numpy(zero_copy_only=False),
        lambda g: g.drop_duplicates(["_key", "bucket"]),
        partitions=partitions,
    ).map_batches(pad_left_markers, batch_format="pyarrow")

    summaries = summaries.map_batches(
        lambda b: b.select(["_key", "bucket", "_ts"] + out_payload + ["is_left"]),
        batch_format="pyarrow",
    )

    # stage 2: per key, for every bucket emit the latest right summary of
    # any strictly earlier bucket (input = summaries + markers, bounded).
    # Fully vectorized: factorize keys, encode (key, bucket) as one
    # monotone composite, one searchsorted finds every target's
    # predecessor — no per-key Python loop (measured 16× on 100k keys).
    carry_schema = pa.schema(
        [("_key", pa.int64()), ("bucket", pa.int64()), ("_ts", pa.int64())]
        + [(oc, payload_types[oc]) for oc in out_payload]
    )

    def carry_ins(t: pa.Table) -> pa.Table:
        # ARROW-NATIVE like join_partition: marker rows carry null
        # _ts/payloads, so payload columns never pass through pandas
        # (int64 would decay to float64) — source rows are selected by
        # index math and gathered with pc.take
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return carry_schema.empty_table()
        keys = t.column("_key").to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = (
            t.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        is_left = (
            t.column("is_left").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        codes, _ = pd.factorize(keys, sort=False)
        bmin = buckets.min()
        B = int(buckets.max() - bmin) + 2
        comp = codes.astype(np.int64) * B + (buckets - bmin)

        r_idx = np.flatnonzero(is_left == 0)
        if not len(r_idx):
            return carry_schema.empty_table()
        r_comp = comp[r_idx]
        r_order = np.argsort(r_comp, kind="stable")
        r_comp_sorted = r_comp[r_order]
        r_code_sorted = codes[r_idx][r_order]

        t_comp, t_first = np.unique(comp, return_index=True)
        pos = np.searchsorted(r_comp_sorted, t_comp, side="left") - 1
        ok = (pos >= 0) & (
            r_code_sorted[np.maximum(pos, 0)] == codes[t_first]
        )
        if not ok.any():
            return carry_schema.empty_table()
        src = pa.array(r_idx[r_order[pos[ok]]].astype(np.int64))
        data = {
            "_key": pa.array(keys[t_first[ok]], pa.int64()),
            "bucket": pa.array(buckets[t_first[ok]], pa.int64()),
            "_ts": pc.take(t.column("_ts"), src),
        }
        for oc in out_payload:
            data[oc] = pc.take(t.column(oc), src)
        return pa.table(data)

    def carry_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        key = b.column("_key").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = b.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        data = {
            "pkey": pa.array(_kb_pkey(key, bucket, partitions), pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
            "_key": pa.array(key, pa.int64()),
            "_ts": b.column("_ts").cast(pa.int64()),
            "side": pa.array(np.ones(n, np.int64), pa.int64()),
        }
        for c in extra_left:
            data[c] = pa.nulls(n, left_types[c])
        for oc in out_payload:
            data[oc] = b.column(oc).cast(payload_types[oc])
        return pa.table(data).select(union_order)

    carries = (
        summaries.union(lmarkers)
        .map_batches(
            lambda b: b.append_column(
                "skey",
                pa.array(
                    _int_pkey(
                        b.column("_key").to_numpy(zero_copy_only=False), partitions
                    ),
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("skey")
        .map_groups(carry_ins, batch_format="pyarrow")
        .map_batches(carry_rows, batch_format="pyarrow")
    )

    return (
        tagged.union(carries)
        .groupby("pkey")
        .map_groups(join_partition, batch_format="pyarrow")
    )


def range_join_agg(
    left_ds,
    right_ds,
    *,
    key_col: str,
    ts_col: str,
    left_cols: list,
    agg_col: str,
    width_us: int,
    partitions: int = ASOF_PARTITIONS,
    bucket_span_us: int | None = None,
):
    """Range join, aggregate form: for each left row, the COUNT and the
    int64 SUM of ``agg_col`` over right rows of the same key with
    ``right.ts ∈ [left.ts − width_us, left.ts]``. The bounded-output
    variant of a range join (the pair-explode variant is a flat_map away;
    the aggregate is what scales).

    Kernel: per partition, rights get per-key prefix sums (one C groupby
    cumsum), then TWO ``merge_asof`` probes (at ``ts`` and ``ts − width −
    1 µs``) difference into exact window aggregates — integer arithmetic
    end-to-end, so prefix-differencing is exact and the DuckDB oracle
    (plain inequality join + GROUP BY) hash-matches. ``agg_col`` must be
    integer for that reason; a float payload would make the prefix
    difference order-sensitive.

    Skew-safety (``bucket_span_us`` set, must be ≥ ``width_us``): rows
    partition by hash(key, ts // span); every RIGHT row is routed to its
    own bucket AND the next one (its influence window spans ≤ 2 buckets),
    so a hot key splits across time with no carry-in machinery at all —
    duplication factor exactly 2 on the right stream only.
    """
    if bucket_span_us is not None and bucket_span_us < width_us:
        raise ValueError("bucket_span_us must be >= width_us")
    extra_left = [c for c in left_cols if c not in (key_col, ts_col)]

    lt_all = _arrow_types(left_ds)
    left_types = {c: lt_all.get(c, pa.float64()) for c in extra_left}
    # "bucket" is the ROUTED bucket and is part of the join key inside each
    # partition: several (key, bucket) groups can share a pkey partition,
    # and a right row's next-bucket duplicate must only be visible to left
    # rows of THAT bucket (else it double-counts)
    union_order = ["pkey", "bucket", "_key", "_ts", "side", "_agg"] + extra_left

    def _route(batch: pa.Table, side: int) -> pa.Table:
        key = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = _ts_int(batch.column(ts_col))
        n = batch.num_rows
        if side == 1:
            agg = batch.column(agg_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            agg = np.zeros(n, np.int64)
        if bucket_span_us:
            bucket = ts // bucket_span_us
            if side == 1:
                # duplicate each right row into its own and the NEXT bucket
                key = np.concatenate([key, key])
                ts = np.concatenate([ts, ts])
                agg = np.concatenate([agg, agg])
                bucket = np.concatenate([bucket, bucket + 1])
                n = 2 * n
            pkey = _kb_pkey(key, bucket, partitions)
        else:
            bucket = np.zeros(n, np.int64)
            pkey = _int_pkey(key, partitions)
        data = {
            "pkey": pa.array(pkey, pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
            "_key": pa.array(key, pa.int64()),
            "_ts": pa.array(ts, pa.int64()),
            "side": pa.array(np.full(n, side, np.int64), pa.int64()),
            "_agg": pa.array(agg, pa.int64()),
        }
        for c in extra_left:
            if side == 0:
                data[c] = batch.column(c)
            else:
                data[c] = pa.nulls(n, left_types[c])
        return pa.table(data).select(union_order)

    tagged = left_ds.map_batches(
        lambda b: _route(b, 0), batch_format="pyarrow"
    ).union(right_ds.map_batches(lambda b: _route(b, 1), batch_format="pyarrow"))

    def window_agg(t: pa.Table) -> pd.DataFrame:
        # nullsafe: extra_left int64 columns carry nulls on right rows
        # (see _nullsafe_pdf — float64 decay would round above 2^53)
        g = _nullsafe_pdf(t)
        for c in ("_key", "bucket", "_ts", "side", "_agg"):
            g[c] = g[c].astype(np.int64)
        side = g["side"].to_numpy()
        lf = g[side == 0][["_key", "bucket", "_ts"] + extra_left]
        rf = g[side == 1][["_key", "bucket", "_ts", "_agg"]]
        if not len(lf):
            out = lf.copy()
            out["n_in_window"] = pd.Series(dtype=np.int64)
            out["sum_in_window"] = pd.Series(dtype=np.int64)
            return out.drop(columns="bucket")
        if not len(rf):
            out = lf.copy()
            out["n_in_window"] = np.int64(0)
            out["sum_in_window"] = np.int64(0)
            return out.drop(columns="bucket")
        rf = rf.sort_values(["_key", "bucket", "_ts"], kind="mergesort").reset_index(
            drop=True
        )
        grp = rf.groupby(["_key", "bucket"], sort=False)
        rf["cum_n"] = grp.cumcount().to_numpy() + 1
        rf["cum_s"] = grp["_agg"].cumsum().to_numpy()
        probe = rf[["_key", "bucket", "_ts", "cum_n", "cum_s"]].sort_values(
            "_ts", kind="mergesort"
        )

        def totals_at(ts_vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            # explicit row id restores left order after the probe sort
            q = pd.DataFrame(
                {
                    "_row": np.arange(len(lf), dtype=np.int64),
                    "_key": lf["_key"].to_numpy(),
                    "bucket": lf["bucket"].to_numpy(),
                    "_ts": ts_vals,
                }
            ).sort_values("_ts", kind="mergesort")
            j = pd.merge_asof(
                q, probe, on="_ts", by=["_key", "bucket"], direction="backward"
            )
            j = j.sort_values("_row", kind="mergesort")
            return (
                j["cum_n"].fillna(0).to_numpy(np.int64),
                j["cum_s"].fillna(0).to_numpy(np.int64),
            )

        lts = lf["_ts"].to_numpy()
        n_hi, s_hi = totals_at(lts)
        n_lo, s_lo = totals_at(lts - width_us - 1)
        out = lf.copy()
        out["n_in_window"] = n_hi - n_lo
        out["sum_in_window"] = s_hi - s_lo
        return out.drop(columns="bucket")

    return tagged.groupby("pkey").map_groups(window_agg, batch_format="pyarrow")


def range_join_pairs(
    left_ds,
    right_ds,
    *,
    key_col: str,
    ts_col: str,
    left_id_col: str,
    right_id_col: str,
    width_us: int,
    partitions: int = ASOF_PARTITIONS,
    bucket_span_us: int | None = None,
):
    """Range join, pair-explode form: one output row per (left, right)
    pair of the same key with ``right.ts ∈ [left.ts − width_us, left.ts]``
    — the INNER-join sibling of :func:`range_join_agg` for when the
    downstream wants the pairs themselves (e.g. building training
    negatives from temporal neighborhoods). Output size is the pair
    count; prefer the aggregate form when only statistics are needed.

    Kernel: rights sort once per (key, bucket); each left row's window is
    a CONTIGUOUS index range found by two merge_asof position probes, and
    the explode is one np.repeat + cumsum-offset gather — no per-row
    Python. Skew path identical to the aggregate form (duplicate right
    routing, routed bucket part of the join key)."""
    if bucket_span_us is not None and bucket_span_us < width_us:
        raise ValueError("bucket_span_us must be >= width_us")

    def _route(batch: pa.Table, side: int, id_col: str) -> pa.Table:
        key = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = _ts_int(batch.column(ts_col))
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        if bucket_span_us:
            bucket = ts // bucket_span_us
            if side == 1:
                key = np.concatenate([key, key])
                ts = np.concatenate([ts, ts])
                ids = np.concatenate([ids, ids])
                bucket = np.concatenate([bucket, bucket + 1])
                n = 2 * n
            pkey = _kb_pkey(key, bucket, partitions)
        else:
            bucket = np.zeros(n, np.int64)
            pkey = _int_pkey(key, partitions)
        return pa.table(
            {
                "pkey": pa.array(pkey, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
                "_key": pa.array(key, pa.int64()),
                "_ts": pa.array(ts, pa.int64()),
                "side": pa.array(np.full(n, side, np.int64), pa.int64()),
                "_id": pa.array(ids, pa.int64()),
            }
        )

    tagged = left_ds.map_batches(
        lambda b: _route(b, 0, left_id_col), batch_format="pyarrow"
    ).union(
        right_ds.map_batches(lambda b: _route(b, 1, right_id_col), batch_format="pyarrow")
    )

    def explode(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        lf = g[side == 0]
        rf = g[side == 1]
        cols = ["left_id", "right_id", "_key", "left_ts", "right_ts"]
        if not len(lf) or not len(rf):
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in cols}
            )
        rf = rf.sort_values(["_key", "bucket", "_ts"], kind="mergesort").reset_index(
            drop=True
        )
        # positions of each right row within the global partition sort
        rf["pos1"] = np.arange(1, len(rf) + 1, dtype=np.int64)
        probe = rf[["_key", "bucket", "_ts", "pos1"]].sort_values(
            "_ts", kind="mergesort"
        )

        def pos_at(ts_vals: np.ndarray) -> np.ndarray:
            q = pd.DataFrame(
                {
                    "_row": np.arange(len(lf), dtype=np.int64),
                    "_key": lf["_key"].to_numpy(),
                    "bucket": lf["bucket"].to_numpy(),
                    "_ts": ts_vals,
                }
            ).sort_values("_ts", kind="mergesort")
            j = pd.merge_asof(
                q, probe, on="_ts", by=["_key", "bucket"], direction="backward"
            )
            return (
                j.sort_values("_row", kind="mergesort")["pos1"]
                .fillna(0)
                .to_numpy(np.int64)
            )

        lts = lf["_ts"].to_numpy()
        hi = pos_at(lts)  # global pos1 of last right <= left ts in the group
        lo = pos_at(lts - width_us - 1)
        # pos1 is GLOBAL partition order: a probe that misses inside its
        # group falls to 0, which would leak earlier groups' rows into the
        # gather — clamp both bounds to the group's start position
        gs = rf.groupby(["_key", "bucket"], as_index=False)["pos1"].min()
        gs["base"] = gs["pos1"] - 1
        base = (
            lf[["_key", "bucket"]]
            .merge(gs[["_key", "bucket", "base"]], on=["_key", "bucket"], how="left")
            ["base"]
            .fillna(0)
            .to_numpy(np.int64)
        )
        hi = np.maximum(hi, base)
        lo = np.maximum(lo, base)
        n_i = hi - lo
        total = int(n_i.sum())
        if not total:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        left_rep = np.repeat(np.arange(len(lf), dtype=np.int64), n_i)
        seg = np.concatenate([[0], np.cumsum(n_i)])[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(seg, n_i)
        r_idx = np.repeat(lo, n_i) + within  # 0-based into rf sort order
        return pd.DataFrame(
            {
                "left_id": lf["_id"].to_numpy()[left_rep],
                "right_id": rf["_id"].to_numpy()[r_idx],
                "_key": lf["_key"].to_numpy()[left_rep],
                "left_ts": lts[left_rep],
                "right_ts": rf["_ts"].to_numpy()[r_idx],
            }
        )

    return tagged.groupby("pkey").map_groups(explode, batch_format="pandas")
