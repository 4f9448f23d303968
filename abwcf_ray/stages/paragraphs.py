"""Paragraph-level corpus cleaning: exact paragraph dedup and
corpus-frequency boilerplate removal.

Two standard web-pipeline operators over the ``documents`` table (the
paragraph-granularity siblings of ``dedup.exact_dedup``; see
RefinedWeb/MassiveText-style line dedup and CCNet-style boilerplate
filtering):

- ``paragraph_dedup``: a paragraph (newline-split segment) is kept only
  at its FIRST corpus occurrence, ordered by ``(doc_id, para_idx)``;
  every later identical paragraph is removed from its document's text.
- ``remove_boilerplate``: a paragraph occurring ``min_df``-or-more times
  corpus-wide (occurrence count, not distinct-doc count) is removed from
  EVERY document.

Both return one row per input document: ``(doc_id, n_paras, n_kept,
text)`` with ``text`` the newline-join of the kept paragraphs in
original order ('' when nothing survives). Empty paragraphs (blank
lines) are always kept — deduping them would strip structure, not
content. Null text is treated as ''.

Scale shape (designed for a 100 TB corpus):

- The explode is one vectorized polars pass (split + int_ranges +
  explode); paragraph TEXT never leaves the map task — only 16-byte
  ``(para_hash, okey)`` occurrence pairs enter any exchange, where
  ``okey = doc_id * 2^20 + para_idx`` is the total occurrence order.
- ``paragraph_dedup`` resolves within-batch duplicates map-side (only
  each batch's per-hash min occurrence is undecided), then one coarse
  ``groupby(hash % P)`` pass computes global winners vectorized per
  partition — the same coarse-partition trick as the LSH dedup family.
- ``remove_boilerplate`` never exchanges occurrences at all: per-batch
  partial counts -> native Sum -> the (small) frequent-hash set is
  broadcast via ``ray.put`` as a sorted uint64 array (zero-copy
  searchsorted from plasma per batch; 10^8 frequent lines = 800 MB
  shared per node).
- Drop application: the drop set broadcasts the same way while it fits
  (``broadcast_max_drops``); past that, documents and drop pairs are
  co-partitioned by ``hash(doc_id) % P`` and reassembled per partition
  (paragraph dedup at web scale drops O(corpus) paragraphs, so the
  broadcast cannot be the only path).

Hashing uses the repo-wide 64-bit ``hash64``; a collision merges two
distinct paragraphs (drops a non-duplicate). At 2^64 that is negligible
below ~10^9 DISTINCT paragraphs per run and is the same trade
``exact_dedup`` makes. The SQL oracles group by the paragraph STRING,
so the driver's value-hash check also guards this end-to-end.

Reference parity: the reference engine has no paragraph operators (it is
a crawler); these extend the training-data family (SURVEY.md section 2,
"beyond the reference").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64

# max paragraphs per document encodable in the occurrence key
# (okey = doc_id * 2^20 + para_idx); doc_id must then fit in 43 bits.
_MAX_PARAS = 1 << 20

# coarse partition count for the winner/reassembly groupbys; at
# multi-node scale set to ~2-4x the cluster's total cores
PARA_MERGE_PARTITIONS = 32

# drop sets at or below this many rows broadcast via ray.put (sorted
# int64 okeys, zero-copy searchsorted from plasma); larger sets take the
# doc-co-partitioned reassembly path. 50M pairs = 400 MB in plasma.
BROADCAST_MAX_DROPS = 50_000_000


def _explode_paragraphs(batch: pa.Table, text_col: str, id_col: str):
    """-> polars frame (doc_id, para, n_paras, para_idx), one row per
    paragraph occurrence, vectorized. Pins ''/null text -> one empty
    paragraph (polars 2.0 changes str.split('') semantics)."""
    import polars as pl

    df = pl.from_arrow(batch.select([id_col, text_col])).rename(
        {text_col: "_t", id_col: "doc_id"}
    )
    df = df.with_columns(pl.col("_t").fill_null("").alias("_t"))
    df = df.with_columns(
        pl.when(pl.col("_t") == "")
        .then(pl.lit([""]))
        .otherwise(pl.col("_t").str.split("\n"))
        .alias("_ps")
    )
    df = df.with_columns(pl.col("_ps").list.len().cast(pl.Int64).alias("n_paras"))
    df = df.with_columns(pl.int_ranges(0, pl.col("n_paras")).alias("para_idx"))
    return df.explode(["_ps", "para_idx"]).rename({"_ps": "para"}).drop("_t")


def _okey(doc_id: np.ndarray, para_idx: np.ndarray) -> np.ndarray:
    if doc_id.size and int(doc_id.max()) >= (1 << 43):
        raise ValueError("doc_id must fit in 43 bits for the occurrence key")
    if para_idx.size and int(para_idx.max()) >= _MAX_PARAS:
        raise ValueError(f"documents must have < {_MAX_PARAS} paragraphs")
    return doc_id * np.int64(_MAX_PARAS) + para_idx


def _occurrence_table(
    batch: pa.Table, text_col: str, id_col: str, skip_empty: bool = True
) -> pa.Table:
    """-> (para_hash uint64, okey int64) occurrence pairs for one batch;
    paragraph text stays inside the task."""
    ex = _explode_paragraphs(batch, text_col, id_col)
    if skip_empty:
        ex = ex.filter(ex["para"] != "")
    h = hash64(ex["para"].to_arrow())
    ok = _okey(ex["doc_id"].to_numpy(), ex["para_idx"].to_numpy())
    return pa.table(
        {"para_hash": pa.array(h, pa.uint64()), "okey": pa.array(ok, pa.int64())}
    )


# --------------------------------------------------------------------------
# drop-set computation
# --------------------------------------------------------------------------
def _dedup_drops(ds, text_col: str, id_col: str, partitions: int):
    """-> Dataset[(okey int64)] of dropped occurrences under first-wins
    paragraph dedup. Map-side: within a batch only the per-hash min
    occurrence is undecided (its losers are decided drops and ride the
    exchange pre-marked); one coarse groupby then settles global
    winners vectorized per partition."""

    def batch_occ(b: pa.Table) -> pa.Table:
        t = _occurrence_table(b, text_col, id_col)
        df = pd.DataFrame(
            {
                "para_hash": t.column("para_hash").to_numpy(zero_copy_only=False),
                "okey": t.column("okey").to_numpy(zero_copy_only=False),
            }
        )
        if len(df):
            local_min = df.groupby("para_hash")["okey"].transform("min")
            decided = (df["okey"] != local_min).to_numpy()
        else:
            decided = np.zeros(0, dtype=bool)
        df["decided"] = decided
        df["_pkey"] = (
            df["para_hash"].to_numpy() % np.uint64(partitions)
        ).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def settle(g: pd.DataFrame) -> pd.DataFrame:
        und = g[~g["decided"]]
        gmin = und.groupby("para_hash")["okey"].transform("min")
        late = und.loc[und["okey"].to_numpy() != gmin.to_numpy(), ["okey"]]
        return pd.concat([g.loc[g["decided"], ["okey"]], late], ignore_index=True)

    return (
        ds.map_batches(batch_occ, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(settle, batch_format="pandas")
    )


def _boilerplate_drops(ds, text_col: str, id_col: str, min_df: int):
    """-> Dataset[(okey int64)] of occurrences whose paragraph occurs
    >= min_df times corpus-wide. Pass 1 aggregates per-batch partial
    counts (exchange = distinct hashes per batch); the frequent-hash set
    broadcasts; pass 2 re-derives drops map-side with zero exchange."""
    import ray
    from abwcf_ray.stages.dedup import keyed_hash_agg

    def partial_counts(b: pa.Table) -> pd.DataFrame:
        t = _occurrence_table(b, text_col, id_col)
        df = pd.DataFrame(
            {"para_hash": t.column("para_hash").to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("para_hash", as_index=False).size()
        g.columns = ["para_hash", "n"]
        return g

    counts = keyed_hash_agg(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        lambda b: b.column("para_hash").to_numpy(zero_copy_only=False),
        lambda g: g.groupby("para_hash", as_index=False).agg(df=("n", "sum")),
    )
    freq = counts.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t.column("df"), pa.scalar(min_df))
        ).select(["para_hash"]),
        batch_format="pyarrow",
    )
    arrs = [
        t.column("para_hash").to_numpy(zero_copy_only=False)
        for t in ray.get(freq.to_arrow_refs())
        if t.num_rows
    ]
    freq_sorted = np.sort(np.concatenate(arrs)) if arrs else np.zeros(0, np.uint64)
    freq_ref = ray.put(freq_sorted)

    def mark(b: pa.Table) -> pa.Table:
        fs = ray.get(freq_ref)
        t = _occurrence_table(b, text_col, id_col)
        h = t.column("para_hash").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(fs, h)
        hit = (pos < fs.size) & (fs[np.minimum(pos, fs.size - 1)] == h) if fs.size else np.zeros(h.size, bool)
        return t.select(["okey"]).filter(pa.array(hit))

    return ds.map_batches(mark, batch_format="pyarrow")


# --------------------------------------------------------------------------
# drop application / reassembly
# --------------------------------------------------------------------------
def _reassemble_frame(ex, drops_sorted: np.ndarray):
    """polars exploded frame + sorted drop okeys -> per-doc rollup
    (doc_id, n_paras, n_kept, text)."""
    import polars as pl

    ok = _okey(ex["doc_id"].to_numpy(), ex["para_idx"].to_numpy())
    if drops_sorted.size:
        pos = np.searchsorted(drops_sorted, ok)
        dropped = (pos < drops_sorted.size) & (
            drops_sorted[np.minimum(pos, drops_sorted.size - 1)] == ok
        )
    else:
        dropped = np.zeros(ok.size, dtype=bool)
    ex = ex.with_columns(pl.Series("kept", ~dropped))
    out = ex.group_by("doc_id", maintain_order=True).agg(
        pl.len().cast(pl.Int64).alias("n_paras"),
        pl.col("kept").sum().cast(pl.Int64).alias("n_kept"),
        pl.col("para").filter(pl.col("kept")).str.join("\n").alias("text"),
    )
    return out.to_arrow().cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_paras", pa.int64()),
                ("n_kept", pa.int64()),
                ("text", pa.string()),
            ]
        )
    )


def _apply_drops(
    ds,
    drops,
    text_col: str,
    id_col: str,
    partitions: int,
    broadcast_max_drops: int,
):
    """Remove dropped occurrences from each document and rebuild its
    text. Broadcast path while the drop set fits in plasma comfortably;
    else documents and drops co-partition by hash(doc_id) % P and each
    partition reassembles its own documents."""
    import ray

    drops = drops.materialize()
    n_drops = drops.count()
    if n_drops <= broadcast_max_drops:
        if n_drops:
            arrs = [
                t.column("okey").to_numpy(zero_copy_only=False)
                for t in ray.get(drops.to_arrow_refs())
                if t.num_rows
            ]
            drops_sorted = np.sort(np.concatenate(arrs))
        else:
            drops_sorted = np.zeros(0, dtype=np.int64)
        drops_ref = ray.put(drops_sorted)

        def rebuild(b: pa.Table) -> pa.Table:
            ex = _explode_paragraphs(b, text_col, id_col)
            return _reassemble_frame(ex, ray.get(drops_ref))

        return ds.map_batches(rebuild, batch_format="pyarrow")

    # partitioned path: union tagged doc rows + drop rows, one groupby
    schema = pa.schema(
        [
            ("_pkey", pa.int64()),
            ("doc_id", pa.int64()),
            ("_text", pa.string()),
            ("okey", pa.int64()),
        ]
    )

    def doc_rows(b: pa.Table) -> pa.Table:
        d = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pkey = (
            d.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            % np.uint64(partitions)
        ).astype(np.int64)
        # null text must stay a DOC row (nulls mark drop rows in the union)
        txt = pa.compute.fill_null(b.column(text_col).cast(pa.string()), "")
        return pa.table(
            {
                "_pkey": pa.array(pkey, pa.int64()),
                "doc_id": pa.array(d, pa.int64()),
                "_text": txt,
                "okey": pa.nulls(len(d), pa.int64()),
            },
            schema=schema,
        )

    def drop_rows(b: pa.Table) -> pa.Table:
        ok = b.column("okey").to_numpy(zero_copy_only=False).astype(np.int64)
        d = (ok // _MAX_PARAS).astype(np.int64)
        pkey = (
            d.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            % np.uint64(partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "_pkey": pa.array(pkey, pa.int64()),
                "doc_id": pa.array(d, pa.int64()),
                "_text": pa.nulls(len(d), pa.string()),
                "okey": pa.array(ok, pa.int64()),
            },
            schema=schema,
        )

    def rebuild_partition(g: pa.Table) -> pa.Table:
        is_doc = pa.compute.is_valid(g.column("_text"))
        docs = g.filter(is_doc)
        dr = g.filter(pa.compute.invert(is_doc))
        drops_sorted = np.sort(dr.column("okey").to_numpy(zero_copy_only=False))
        doc_batch = pa.table(
            {"doc_id": docs.column("doc_id"), text_col: docs.column("_text")}
        )
        return _reassemble_frame(
            _explode_paragraphs(doc_batch, text_col, "doc_id"), drops_sorted
        )

    tagged_docs = ds.map_batches(doc_rows, batch_format="pyarrow")
    tagged_drops = drops.map_batches(drop_rows, batch_format="pyarrow")
    return (
        tagged_docs.union(tagged_drops)
        .groupby("_pkey")
        .map_groups(rebuild_partition, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# public operators
# --------------------------------------------------------------------------
def paragraph_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int = PARA_MERGE_PARTITIONS,
    broadcast_max_drops: int = BROADCAST_MAX_DROPS,
):
    """First-wins exact paragraph dedup -> one row per document:
    ``(doc_id, n_paras, n_kept, text)``. See module docstring."""
    drops = _dedup_drops(ds, text_col, id_col, partitions)
    return _apply_drops(
        ds, drops, text_col, id_col, partitions, broadcast_max_drops
    )


def remove_boilerplate(
    ds,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int = PARA_MERGE_PARTITIONS,
    broadcast_max_drops: int = BROADCAST_MAX_DROPS,
):
    """Remove every paragraph occurring >= ``min_df`` times corpus-wide
    -> one row per document: ``(doc_id, n_paras, n_kept, text)``."""
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    drops = _boilerplate_drops(ds, text_col, id_col, min_df)
    return _apply_drops(
        ds, drops, text_col, id_col, partitions, broadcast_max_drops
    )
