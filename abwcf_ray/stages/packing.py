"""Document chunking for training-sequence packing: split each document's
whitespace tokens into fixed-size windows (the pre-tokenizer step of
sequence packing — at real scale the chunker feeds a BPE tokenizer actor
pool; the windowing math is identical).

Fully vectorized in Rust string kernels (polars): whitespace
normalization, token split, per-chunk ``list.slice`` with EXPRESSION
offsets, and ``list.join`` — no per-chunk Python join, no per-row loop.
Pure map-side flat-map (cardinality grows, nothing shuffles); chunk
boundaries depend only on the row itself, so retries are exact.
"""

from __future__ import annotations

import pyarrow as pa


def chunk_documents(
    ds,
    chunk_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """-> one row per chunk: (id_col, chunk_id, chunk_text, n_tokens).
    Non-overlapping ``chunk_tokens``-word windows over the whitespace
    tokens; the last chunk keeps the remainder (>= 1 token). Empty/
    whitespace-only documents produce no chunks. ``chunk_text`` is the
    single-space join of the window's tokens (whitespace runs do not
    survive chunking — tokens do)."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")

    def chunk(batch: pa.Table) -> pa.Table:
        import polars as pl

        c = pl.lit(chunk_tokens, dtype=pl.Int64)
        df = pl.from_arrow(batch.select([id_col, text_col])).rename(
            {text_col: "_t"}
        )
        toks = (
            pl.col("_t")
            .fill_null("")
            .str.extract_all(r"\S+")
            .alias("_ws")
        )
        target = pa.schema(
            [
                (id_col, batch.schema.field(id_col).type),
                ("chunk_id", pa.int64()),
                ("chunk_text", pa.string()),
                ("n_tokens", pa.int64()),
            ]
        )
        exploded = (
            df.with_columns(toks)
            .with_columns(pl.col("_ws").list.len().cast(pl.Int64).alias("_n"))
            .with_columns(
                pl.int_ranges(0, (pl.col("_n") + c - 1) // c).alias("chunk_id")
            )
            .explode("chunk_id")
            .filter(pl.col("chunk_id").is_not_null())
        )
        if exploded.height == 0:
            # a block of only empty docs: polars degrades list.slice on a
            # zero-row frame to dtype null, so build the empty table directly
            return target.empty_table()
        out = (
            exploded.with_columns(
                pl.col("_ws")
                .list.slice(pl.col("chunk_id") * c, c)
                .list.join(" ")
                .alias("chunk_text"),
                pl.min_horizontal(
                    pl.col("_n") - pl.col("chunk_id") * c, c
                ).alias("n_tokens"),
            )
            .select([id_col, "chunk_id", "chunk_text", "n_tokens"])
        )
        # polars large_string -> plain string for stable downstream schema
        return out.to_arrow().cast(target)

    return ds.map_batches(chunk, batch_format="pyarrow")


def pack_bins(
    ds,
    *,
    window: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    merge_partitions: int = 64,
):
    """GPT-style sequence packing by GLOBAL token offsets: concatenate all
    documents' whitespace tokens in ``id_col`` order and split every
    ``window`` tokens — tokens cross document boundaries, no padding.
    Returns one row per (bin, doc) incidence:

        (bin_id, id_col, n_in_bin)

    where ``n_in_bin`` is how many of the doc's tokens land in that bin.
    Zero-token documents span no bins (mirrors chunk_documents).

    The global prefix sum distributes as a classic two-level scan:

    1. one token-count pass reduces the corpus to the SLIM (id, n) table
       (16 B/doc — materialized once so the count pass never re-runs);
    2. docs range-bucket by id into ``buckets`` coarse ranges; ONE small
       exchange settles per-bucket token sums, the driver computes the
       exclusive prefix over <= ``buckets`` rows and the base offsets
       broadcast in the task closure (8 B/bucket);
    3. ONE keyed exchange co-locates each bucket; within a bucket the
       prefix is a local vectorized cumsum + its base, and the doc->bin
       span explode (np.repeat + offset aranges) happens map-side in the
       same pass — output rows never reshuffle.

    Bin boundaries are pure arithmetic over exact int64 prefix sums, so a
    SQL oracle (window SUM + lateral range explode) value-matches. Skew
    bound: one bucket holds ~N/buckets docs and is materialized per
    group; raise ``buckets`` for very large corpora.
    """
    import numpy as np
    import pandas as pd

    from abwcf_ray.stages.dedup import keyed_hash_agg

    if window < 1:
        raise ValueError("window must be >= 1")
    W = np.int64(window)

    def counts(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col).to_pandas().astype("string").fillna("")
        import numpy as _np

        return pa.table(
            {
                id_col: batch.column(id_col),
                "n": pa.array(
                    t.str.count(r"\S+").to_numpy(_np.int64), pa.int64()
                ),
            }
        )

    rows = ds.map_batches(counts, batch_format="pyarrow").materialize()
    if rows.count() == 0:
        sch = rows.schema()
        id_type = (
            dict(zip(sch.names, sch.types))[id_col]
            if sch is not None
            else pa.int64()
        )
        empty = pa.schema(
            [
                ("bin_id", pa.int64()),
                (id_col, id_type),
                ("n_in_bin", pa.int64()),
            ]
        ).empty_table()
        import ray.data as rd

        return rd.from_arrow(empty)
    lo = int(rows.min(id_col))
    hi = int(rows.max(id_col))
    # exact-Python-int span: full-range int64 ids give span up to 2^64-1,
    # which overflows signed arithmetic — do the offset math in uint64,
    # where (ids - lo) mod 2^64 IS the true non-negative offset.
    span = hi - lo  # unbounded Python int
    width = max(1, (span + buckets) // buckets)
    lo_u = np.uint64(lo & 0xFFFFFFFFFFFFFFFF)
    width_u = np.uint64(width)

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        off = ids.astype(np.int64).view(np.uint64) - lo_u
        return (off // width_u).astype(np.int64)

    # pass 2: per-bucket token totals -> driver exclusive prefix
    def bucket_sums(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        b = bucket_of(ids)
        ub, inv = np.unique(b, return_inverse=True)
        s = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table(
            {"b": pa.array(ub, pa.int64()), "s": pa.array(s, pa.int64())}
        )

    bsum = (
        keyed_hash_agg(
            rows.map_batches(bucket_sums, batch_format="pyarrow"),
            lambda b: b.column("b").to_numpy(zero_copy_only=False),
            lambda g: g.groupby("b", as_index=False).agg(s=("s", "sum")),
            partitions=merge_partitions,
        )
        .to_pandas()
        .sort_values("b")
    )
    nb = (hi - lo) // width + 1
    base = np.zeros(nb, np.int64)
    bs = np.zeros(nb, np.int64)
    bs[bsum["b"].to_numpy(np.int64)] = bsum["s"].to_numpy(np.int64)
    base[1:] = np.cumsum(bs)[:-1]

    # pass 3: within-bucket prefix + span explode, all map-side per shard
    def finish(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        n = g["n"].to_numpy(np.int64)
        b = bucket_of(ids)
        order = np.lexsort((ids, b))
        ids, n, b = ids[order], n[order], b[order]
        cs = np.cumsum(n) - n
        first_idx = np.r_[0, np.flatnonzero(np.diff(b)) + 1]
        seg_len = np.diff(np.r_[first_idx, len(b)])
        s = cs - np.repeat(cs[first_idx], seg_len) + base[b]
        keep = n > 0
        ids, n, s = ids[keep], n[keep], s[keep]
        first = s // W
        k = ((s + n - 1) // W - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), k)
        intra = np.arange(int(k.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(k) - k, k
        )
        bins = first[idx] + intra
        tok = np.minimum(s[idx] + n[idx], (bins + 1) * W) - np.maximum(
            s[idx], bins * W
        )
        return pd.DataFrame(
            {"bin_id": bins, id_col: ids[idx], "n_in_bin": tok}
        )

    return keyed_hash_agg(
        rows,
        lambda t: bucket_of(t.column(id_col).to_numpy(zero_copy_only=False)),
        finish,
        partitions=merge_partitions,
    )
