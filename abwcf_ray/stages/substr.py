"""Exact duplicated-substring removal (the ExactSubstr operator of Lee et
al. 2022, "Deduplicating Training Data Makes Language Models Better"):
token runs of length >= ``k`` that occur more than once corpus-wide are
removed from every occurrence EXCEPT the first (ordered by (doc_id, pos)).

Lee et al. build a corpus-wide suffix array — a fundamentally
single-address-space structure. The Ray-Data-native equivalent works on
k-token gram positions instead, which is exact at gram granularity:

- a duplicated token run of length L >= k contributes L - k + 1 duplicated
  k-grams, every one of which this operator detects (identical token
  sequence => identical gram), and the union of their [pos, pos+k) spans
  is exactly the duplicated run;
- conversely a k-gram occurring twice IS a duplicated k-token substring,
  so there are no false positives (up to 64-bit gram-hash collisions,
  bounded ~ D^2/2^64 for D distinct grams — the same measured-soundness
  trade as ``exact_dedup``/``ngram_dedup``; the SQL oracle groups by gram
  STRINGS, so the driver's value-hash check guards it end-to-end).

Scale shape (designed for a 100 TB corpus):

1. **Gram emit** — one vectorized pass per batch (the shared shifted-slice
   FNV combine of ``dedup._batch_shingle_hashes``, positional variant):
   only 24-byte ``(gram_hash, okey, pkey)`` rows enter the exchange; text
   never leaves the map task. ``okey = doc_id * 2^20 + pos`` is the total
   occurrence order (same 2^20 tokens-per-doc contract as
   ``stages/paragraphs.py``).
2. **Winnowing (the scale lever)** — with ``window = w > 1`` only each
   w-gram window's minimal gram hash is emitted (robust winnowing,
   Schleimer et al. 2003): the exchange shrinks ~w-fold, and because the
   selection is content-defined, any duplicated run of length
   >= k + w - 1 still shares at least one selected gram in BOTH copies —
   recall trades only on runs shorter than k + w - 1. ``window=1`` is the
   exact mode the SQL oracle checks.
3. **Winner settlement** — one coarse ``groupby(hash % P)`` pass; within a
   partition each gram's occurrences settle vectorized (first occurrence
   survives, the rest become 8-byte drop okeys) — the same
   coarse-partition trick as the LSH dedup family; a gram's occurrences
   always co-locate because pkey derives from the gram hash.
4. **Drop application** — three regimes, cheapest that fits:
   (a) drop okeys broadcast as one sorted array while they fit
   (``broadcast_max_drops``); (b) past that, the DISTINCT dup doc-id
   set (smaller than the drop set by the spans-per-doc factor)
   broadcasts instead — clean docs rebuild map-side without entering
   any exchange, and only duplicated docs co-partition with their
   drops by ``hash(doc_id) % P2`` where P2 scales with the dup-doc
   count (``dup_docs_per_partition``), bounding each materialized
   group; (c) if even the id set is too big
   (``broadcast_max_dup_ids``), every doc co-partitions (duplicated
   text at web scale is a constant fraction of the corpus, so
   broadcast cannot be the only path). Dropped token masks come from
   a span diff-array (+1 at pos, -1 at pos+k, cumsum > 0), so
   overlapping spans merge for free.

Output contract: one row per input document —
``(doc_id, n_tokens, n_kept, text_clean)`` with ``text_clean`` the
space-join of surviving tokens in original order ('' when nothing
survives). The operator is defined over the whitespace token stream
(Lee et al. operate on token sequences, not raw bytes), so runs of
whitespace normalize to single spaces in the rebuilt text.

Reference anchor: the reference engine (a crawler) has no substring
dedup; this operator extends the training-data family per the build
brief, shaped after Lee et al. 2022 §3.2 (ExactSubstr).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64

_FNV_OFFSET64 = np.uint64(0xCBF29CE484222325)
_FNV_PRIME64 = np.uint64(0x100000001B3)
_GOLDEN64 = 0x9E3779B97F4A7C15
_MAX_POS = 1 << 20  # tokens per document (same contract as paragraphs.py)

DEFAULT_PARTITIONS = 32
BROADCAST_MAX_DROPS = 50_000_000
DUP_DOCS_PER_PARTITION = 32_768


def _batch_gram_positions(
    texts: list, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Positional k-gram hashes for a whole batch: one ``hash64`` call over
    all tokens + k shifted-slice FNV combines (the positional sibling of
    ``dedup._batch_shingle_hashes`` — positions kept, no uniquing; docs
    shorter than k tokens emit nothing, they cannot contain a k-run).

    Returns (gram_hash u64, doc_index i64, pos i64, token_counts i64)."""
    tok_lists = [t.split() if t else [] for t in texts]
    lens = np.array([len(x) for x in tok_lists], dtype=np.int64)
    flat = [w for ts in tok_lists for w in ts]
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, np.int64))
    if not flat:
        return (*empty, lens)
    H = hash64(flat)
    doc_starts = np.concatenate([[0], np.cumsum(lens)])
    counts = np.maximum(lens - k + 1, 0)
    total = int(counts.sum())
    if not total:
        return (*empty, lens)
    base = np.repeat(doc_starts[:-1], counts)
    seg_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(seg_start, counts)
    ws = base + pos
    C = np.full(total, _FNV_OFFSET64, dtype=np.uint64)
    for j in range(k):
        C = (C ^ H[ws + j]) * _FNV_PRIME64
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    return C, doc_idx, pos, lens


def _winnow_select(C: np.ndarray, doc_idx: np.ndarray, window: int) -> np.ndarray:
    """Robust-winnowing selection mask over per-doc gram-hash runs: keep a
    position iff its hash is the (rightmost) minimum of at least one
    w-window within its document. Content-defined, so both copies of a
    duplicated run >= k + w - 1 tokens select the same gram."""
    if window <= 1 or not C.size:
        return np.ones(C.size, dtype=bool)
    from numpy.lib.stride_tricks import sliding_window_view

    n = C.size
    keep = np.zeros(n, dtype=bool)
    starts = np.flatnonzero(np.concatenate([[True], doc_idx[1:] != doc_idx[:-1]]))
    ends = np.concatenate([starts[1:], [n]])
    # one batch-wide sliding pass; a window is valid iff it lies entirely
    # inside one doc (both endpoints share doc_idx) — no per-doc Python.
    if n >= window:
        sw = sliding_window_view(C, window)  # view, no copy
        arg = window - 1 - sw[:, ::-1].argmin(axis=1)  # rightmost min
        a = np.arange(n - window + 1)
        valid = doc_idx[a] == doc_idx[a + window - 1]
        keep[(a + arg)[valid]] = True
    # runs shorter than the window get their rightmost whole-run min:
    # gather those runs' elements into one flat array and settle them with
    # segmented reduceat — still no per-doc Python.
    short = np.flatnonzero(ends - starts < window)
    if short.size:
        s = starts[short]
        lens = ends[short] - s
        segb = np.concatenate([[0], np.cumsum(lens)])[:-1]
        idx = np.repeat(s - segb, lens) + np.arange(int(lens.sum()))
        c = C[idx]
        m_exp = np.repeat(np.minimum.reduceat(c, segb), lens)
        cand = np.where(c == m_exp, idx, -1)
        keep[np.maximum.reduceat(cand, segb)] = True
    return keep


def _occurrence_stage(text_col: str, id_col: str, k: int, window: int,
                      partitions: int):
    def occ(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas().astype("string").fillna("")
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        C, doc_idx, pos, _ = _batch_gram_positions(list(texts), k)
        if window > 1:
            m = _winnow_select(C, doc_idx, window)
            C, doc_idx, pos = C[m], doc_idx[m], pos[m]
        gh = C.view(np.int64)
        okey = ids[doc_idx] * _MAX_POS + pos
        pkey = ((C * np.uint64(_GOLDEN64)) >> np.uint64(29)) % np.uint64(partitions)
        return pa.table(
            {
                "gh": pa.array(gh, pa.int64()),
                "okey": pa.array(okey, pa.int64()),
                "pkey": pa.array(pkey.astype(np.int64), pa.int64()),
            }
        )

    return occ


def _settle(g: pd.DataFrame) -> pd.DataFrame:
    """One coarse partition of (gh, okey) occurrences -> drop okeys (every
    occurrence of a >=2-count gram except its min okey)."""
    if not len(g):
        return pd.DataFrame({"okey": pd.Series([], dtype="int64")})
    s = g.sort_values(["gh", "okey"])
    gh = s["gh"].to_numpy()
    first = np.concatenate([[True], gh[1:] != gh[:-1]])
    return pd.DataFrame({"okey": s["okey"].to_numpy()[~first]})


def _rebuild_docs(doc_batch: pa.Table, drops_sorted: np.ndarray, k: int,
                  text_col: str, id_col: str) -> pa.Table:
    """Documents + sorted drop okeys -> (doc_id, n_tokens, n_kept,
    text_clean): span diff-array over the batch's flat token stream."""
    import polars as pl

    ids = doc_batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = doc_batch.column(text_col).to_pandas().astype("string").fillna("")
    tok_lists = [t.split() if t else [] for t in texts]
    lens = np.array([len(x) for x in tok_lists], dtype=np.int64)
    doc_starts = np.concatenate([[0], np.cumsum(lens)])
    total = int(doc_starts[-1])

    diff = np.zeros(total + 1, dtype=np.int64)
    if drops_sorted.size and total:
        lo = np.searchsorted(drops_sorted, ids * _MAX_POS)
        hi = np.searchsorted(drops_sorted, (ids + 1) * _MAX_POS)
        for i in np.flatnonzero(hi > lo):
            p = drops_sorted[lo[i] : hi[i]] - ids[i] * _MAX_POS
            st = doc_starts[i] + p
            en = doc_starts[i] + np.minimum(p + k, lens[i])
            np.add.at(diff, st, 1)
            np.add.at(diff, en, -1)
    dropped = np.cumsum(diff[:-1]) > 0 if total else np.zeros(0, dtype=bool)

    flat = [w for ts in tok_lists for w in ts]
    ex = pl.DataFrame(
        {
            "doc_id": np.repeat(ids, lens),
            "tok": pl.Series(flat, dtype=pl.String),
            "kept": ~dropped,
        }
    )
    agg = ex.group_by("doc_id", maintain_order=True).agg(
        pl.len().cast(pl.Int64).alias("n_tokens"),
        pl.col("kept").sum().cast(pl.Int64).alias("n_kept"),
        pl.col("tok").filter(pl.col("kept")).str.join(" ").alias("text_clean"),
    )
    # zero-token docs never enter the exploded frame: re-attach them
    out = pd.DataFrame(
        {"doc_id": ids, "n_tokens": lens}
    ).merge(agg.to_pandas().drop(columns=["n_tokens"]), on="doc_id", how="left")
    out["n_kept"] = out["n_kept"].fillna(0).astype(np.int64)
    out["text_clean"] = out["text_clean"].fillna("")
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "n_tokens": pa.array(out["n_tokens"].to_numpy(), pa.int64()),
            "n_kept": pa.array(out["n_kept"].to_numpy(), pa.int64()),
            "text_clean": pa.array(out["text_clean"], pa.string()),
        }
    )


def exact_substring_dedup(
    ds,
    *,
    k: int = 32,
    window: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int = DEFAULT_PARTITIONS,
    broadcast_max_drops: int = BROADCAST_MAX_DROPS,
    broadcast_max_dup_ids: int | None = None,
    dup_docs_per_partition: int = DUP_DOCS_PER_PARTITION,
    return_dataset: bool = True,
):
    """Remove every duplicated >=k-token run except its first occurrence.
    ``window=1`` is exact; ``window=w>1`` winnows the exchange w-fold and
    is exact for runs >= k + w - 1 tokens."""
    import ray

    occ = ds.map_batches(
        _occurrence_stage(text_col, id_col, k, window, partitions),
        batch_format="pyarrow",
    )
    drops = occ.groupby("pkey").map_groups(_settle, batch_format="pandas")

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
            return _rebuild_docs(b, ray.get(drops_ref), k, text_col, id_col)

        out = ds.map_batches(rebuild, batch_format="pyarrow")
        return out if return_dataset else out.to_pandas()

    # drops don't fit: try broadcasting just the DISTINCT dup doc-id set
    # (smaller by the spans-per-doc factor) so clean docs never enter an
    # exchange and only duplicated docs co-partition with their drops.
    if broadcast_max_dup_ids is None:
        broadcast_max_dup_ids = broadcast_max_drops

    def _ids_of(b: pa.Table) -> pa.Table:
        ok = b.column("okey").to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(np.unique(ok // _MAX_POS), pa.int64())}
        )

    from abwcf_ray.stages.dedup import keyed_hash_agg

    dup_ids_ds = keyed_hash_agg(
        drops.map_batches(_ids_of, batch_format="pyarrow"),
        lambda b: b.column("doc_id").to_numpy(zero_copy_only=False),
        lambda g: g[["doc_id"]].drop_duplicates(),
    ).materialize()
    n_dup = dup_ids_ds.count()
    # bound each materialized rebuild group by the dup-doc count in BOTH
    # regimes: under the broadcast (regime b) only dup docs co-partition;
    # past it (regime c) everything does, and dups dominate the corpus by
    # construction there, so the same lower bound keeps groups bounded
    partitions = max(partitions, -(-n_dup // max(dup_docs_per_partition, 1)))
    dup_ids_ref = None
    if n_dup <= broadcast_max_dup_ids:
        id_arrs = [
            t.column("doc_id").to_numpy(zero_copy_only=False)
            for t in ray.get(dup_ids_ds.to_arrow_refs())
            if t.num_rows
        ]
        dup_ids_ref = ray.put(
            np.sort(np.concatenate(id_arrs)) if id_arrs
            else np.zeros(0, dtype=np.int64)
        )

    # co-partitioned path: union tagged doc rows + drop rows, one groupby.
    # okey uses a -1 sentinel for doc rows (NOT null): a null int64 column
    # coerced through a pandas block boundary becomes float64, which both
    # breaks integer indexing downstream and loses precision for okeys
    # beyond 2^53 at scale.
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
        txt = pa.compute.fill_null(b.column(text_col).cast(pa.string()), "")
        if dup_ids_ref is not None:
            # only dup docs enter the exchange; clean docs are rebuilt
            # map-side by rebuild_clean below
            dup_sorted = ray.get(dup_ids_ref)
            if dup_sorted.size:
                pos = np.searchsorted(dup_sorted, d)
                is_dup = (pos < dup_sorted.size) & (
                    dup_sorted[np.minimum(pos, dup_sorted.size - 1)] == d
                )
            else:
                is_dup = np.zeros(d.size, dtype=bool)
            d, txt = d[is_dup], txt.filter(pa.array(is_dup))
        pkey = (
            d.astype(np.uint64) * np.uint64(_GOLDEN64) % np.uint64(partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "_pkey": pa.array(pkey, pa.int64()),
                "doc_id": pa.array(d, pa.int64()),
                "_text": txt,
                "okey": pa.array(np.full(len(d), -1, dtype=np.int64), pa.int64()),
            },
            schema=schema,
        )

    def drop_rows(b: pa.Table) -> pa.Table:
        ok = b.column("okey").to_numpy(zero_copy_only=False).astype(np.int64)
        d = (ok // _MAX_POS).astype(np.int64)
        pkey = (
            d.astype(np.uint64) * np.uint64(_GOLDEN64) % np.uint64(partitions)
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

    tagged = ds.map_batches(doc_rows, batch_format="pyarrow").union(
        drops.map_batches(drop_rows, batch_format="pyarrow")
    )

    def rebuild_partition(g: pa.Table) -> pa.Table:
        okeys = g.column("okey").to_numpy(zero_copy_only=False).astype(np.int64)
        is_doc = okeys < 0
        docs = g.filter(pa.array(is_doc))
        drops_sorted = np.sort(okeys[~is_doc])
        doc_batch = pa.table(
            {
                id_col: docs.column("doc_id"),
                text_col: pa.compute.fill_null(
                    docs.column("_text").cast(pa.string()), ""
                ),
            }
        )
        return _rebuild_docs(doc_batch, drops_sorted, k, text_col, id_col)

    out = tagged.groupby("_pkey").map_groups(rebuild_partition, batch_format="pyarrow")

    if dup_ids_ref is not None:
        # clean docs (no drops anywhere) rebuild map-side, never shuffled
        def rebuild_clean(b: pa.Table) -> pa.Table:
            dup_sorted = ray.get(dup_ids_ref)
            d = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if dup_sorted.size:
                pos = np.searchsorted(dup_sorted, d)
                is_dup = (pos < dup_sorted.size) & (
                    dup_sorted[np.minimum(pos, dup_sorted.size - 1)] == d
                )
            else:
                is_dup = np.zeros(d.size, dtype=bool)
            clean = b.filter(pa.array(~is_dup))
            doc_batch = pa.table(
                {id_col: clean.column(id_col), text_col: clean.column(text_col)}
            )
            return _rebuild_docs(
                doc_batch, np.zeros(0, dtype=np.int64), k, text_col, id_col
            )

        out = ds.map_batches(rebuild_clean, batch_format="pyarrow").union(out)

    return out if return_dataset else out.to_pandas()
