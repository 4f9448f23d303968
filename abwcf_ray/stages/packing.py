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
