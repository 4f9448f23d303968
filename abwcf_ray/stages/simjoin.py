"""Exact set-similarity self-join via PREFIX FILTERING — the AllPairs /
PPJoin family (Bayardo, Ma, Srikant, "Scaling Up All Pairs Similarity
Search", WWW 2007): enumerate EVERY pair of documents whose k-shingle
Jaccard similarity meets a threshold, with recall 1.0 BY CONSTRUCTION —
the guaranteed-complete counterpart of the probabilistic LSH candidates
in ``ngram_jaccard_dedup`` (minhash recall < 1 is a tuning knob there;
here completeness is a theorem).

The prefix-filter theorem: order every document's element set by one
GLOBAL total order and keep only the first ``|x| - ceil(t*|x|) + 1``
elements (the "prefix"). Any pair with J(A, B) >= t shares at least one
element in both prefixes — so bucketing docs by prefix element and
pairing within buckets misses nothing. Ordering elements rarest-first
(ascending document frequency) makes prefixes land in the SMALLEST
buckets, which is what bounds the candidate blow-up: a bucket for
element e holds at most df(e) docs, and prefix elements are by
construction the low-df tail.

Distributed shape, one stage per exchange:

1. payload pass (shuffle-free): per-batch vectorized k-shingling
   (``dedup._batch_shingle_hashes`` — one hash call per batch) into
   per-doc sorted unique shingle-hash sets.
2. document-frequency pass: per-batch (hash, partial df) combiner +
   one keyed merge — exchange O(distinct shingles); the (df, hash)
   vocabulary order is broadcast ONCE (``ray.put``), the same bounded
   driver contract as the LM vocabulary build (``lm.lm_rarity_score``).
   ``order="hash"`` skips this pass entirely (the hash value is itself
   a total order) for vocabularies too large to broadcast — correct,
   just prunes less.
3. prefix explode: map-side rank lookup (one searchsorted) + segmented
   per-doc rank sort; only PREFIX (rank, id) pairs enter the ONE
   bucket-keyed exchange; per-bucket pair enumeration reuses the
   shared ``fuzzy.segment_pair_indices`` combination kernel, then one
   pair-keyed dedupe exchange.
4. exact verify: the shared ``dedup.verify_edges_distributed`` payload
   router (each doc's shingle set crosses the wire once per incident
   edge, never the driver) with an ``emit_fn`` computing per-pair
   overlap STATISTICS via one flat lexsort over the partition's
   (pair, hash, side) triples — no per-pair Python set work.

The threshold is a RATIONAL tn/td so the accept test
``td*shared >= tn*(|A| + |B| - shared)`` is exact integer arithmetic;
the reported jaccard is ONE IEEE division of exact int64s (the repo
float-hash discipline). Set elements are 64-bit shingle hashes — the
same token-hash-mix contract as the minhash family (identical token
sequences produce identical shingles; cross-token collisions are
2^-64-scale and shared with the oracle argument in COVERAGE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import (
    DEDUP_MERGE_PARTITIONS,
    _batch_shingle_hashes,
    keyed_hash_agg,
    verify_edges_distributed,
)
from abwcf_ray.stages.fuzzy import segment_pair_indices

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_PAYLOAD_TYPE = pa.list_(pa.int64())


def _shingle_payload_stage(shingle_k: int, text_col: str, id_col: str):
    def stage(b: pa.Table) -> pa.Table:
        texts = [t or "" for t in b.column(text_col).to_pylist()]
        C, sd, _ = _batch_shingle_hashes(texts, shingle_k)
        counts = (
            np.bincount(sd, minlength=len(texts)).astype(np.int64)
            if len(sd)
            else np.zeros(len(texts), np.int64)
        )
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        payload = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(C.view(np.int64))
        )
        return pa.table(
            {
                id_col: b.column(id_col).cast(pa.int64()),
                "payload": payload,
            }
        )

    return stage


def _doc_frequencies(payload_ds, merge_partitions: int):
    """(h:int64, df:int64) — exchange O(distinct shingles), map-side
    combined (each batch ships each of its distinct hashes once)."""

    def explode(b: pa.Table) -> pa.Table:
        pl = b.column("payload")
        if isinstance(pl, pa.ChunkedArray):
            pl = pl.combine_chunks()
        flat = pl.flatten().to_numpy(zero_copy_only=False)
        h, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {"h": pa.array(h, pa.int64()), "df": pa.array(cnt.astype(np.int64))}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("h", as_index=False, sort=False)["df"].sum()
        out["df"] = out["df"].astype(np.int64)
        return out

    return keyed_hash_agg(
        payload_ds.map_batches(explode, batch_format="pyarrow"),
        lambda b: b.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        * _GOLD,
        merge,
        partitions=merge_partitions,
    )


def _prefix_len(n: np.ndarray, tn: int, td: int) -> np.ndarray:
    """|x| - ceil(t*|x|) + 1 (elementwise, exact integer)."""
    return n - (tn * n + td - 1) // td + 1


def similarity_join(
    ds,
    *,
    threshold_num: int,
    threshold_den: int,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: str = "df",
    merge_partitions: int = DEDUP_MERGE_PARTITIONS,
):
    """All pairs (src < dst) with shingle-Jaccard >= tn/td. Returns a
    Dataset of (src, dst, shared, size_a, size_b, jaccard) — counts
    exact int64, jaccard one IEEE division."""
    import ray

    tn, td = int(threshold_num), int(threshold_den)
    if not (0 < tn <= td):
        raise ValueError("threshold must be a fraction in (0, 1]")
    if order not in ("df", "hash"):
        raise ValueError("order must be 'df' or 'hash'")

    payload_ds = ds.map_batches(
        _shingle_payload_stage(shingle_k, text_col, id_col),
        batch_format="pyarrow",
    ).materialize()  # consumed three times: df pass, prefix pass, verify

    if order == "df":
        vocab = _doc_frequencies(payload_ds, merge_partitions).to_pandas()
        h = vocab["h"].to_numpy(np.int64)
        df = vocab["df"].to_numpy(np.int64)
        # rank in (df ASC, hash ASC) order; lookup arrays sorted by hash
        rank_in_order = np.empty(len(h), np.int64)
        rank_in_order[np.lexsort((h, df))] = np.arange(len(h), dtype=np.int64)
        hs_order = np.argsort(h, kind="stable")
        bc = ray.put((h[hs_order], rank_in_order[hs_order]))
    else:
        bc = None

    def prefix_explode(b: pa.Table) -> pa.Table:
        pl = b.column("payload")
        if isinstance(pl, pa.ChunkedArray):
            pl = pl.combine_chunks()
        flat = pl.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = pl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            e = np.empty(0, np.int64)
            return pa.table({"r": pa.array(e), "doc": pa.array(e)})
        if bc is not None:
            vs, vr = ray.get(bc)
            ranks = vr[np.searchsorted(vs, flat)]
        else:
            ranks = flat
        did = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        order_ix = np.lexsort((ranks, did))
        rs = ranks[order_ix]
        seg_start = np.concatenate([[0], np.cumsum(lens)])[:-1]
        within = np.arange(len(flat), dtype=np.int64) - np.repeat(
            seg_start, lens
        )
        p = _prefix_len(lens, tn, td)
        keep = within < np.repeat(p, lens)
        return pa.table(
            {
                "r": pa.array(rs[keep]),
                "doc": pa.array(np.repeat(ids, lens)[order_ix][keep]),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            e = pd.Series([], dtype=np.int64)
            return pd.DataFrame({"src": e, "dst": e})
        g = g.sort_values(["r", "doc"], kind="mergesort")
        r = g["r"].to_numpy(np.int64)
        doc = g["doc"].to_numpy(np.int64)
        new = np.empty(len(g), bool)
        new[0] = True
        new[1:] = r[1:] != r[:-1]
        seg_start = np.flatnonzero(new)
        seg_len = np.diff(np.append(seg_start, len(g)))
        ai, bi = segment_pair_indices(seg_start, seg_len)
        out = pd.DataFrame({"src": doc[ai], "dst": doc[bi]})
        return out.drop_duplicates()

    prefix_ds = payload_ds.map_batches(prefix_explode, batch_format="pyarrow")
    cand = keyed_hash_agg(
        prefix_ds,
        lambda b: b.column("r").to_numpy(zero_copy_only=False).view(np.uint64)
        * _GOLD,
        bucket_pairs,
        partitions=merge_partitions,
    )
    # global pair dedupe (a pair can surface under several prefix buckets)
    cand = keyed_hash_agg(
        cand,
        lambda b: (
            b.column("src").to_numpy(zero_copy_only=False).view(np.uint64)
            * _GOLD
            ^ b.column("dst").to_numpy(zero_copy_only=False).view(np.uint64)
        ),
        lambda g: g.drop_duplicates(["src", "dst"]),
        partitions=merge_partitions,
    )

    return verify_edges_distributed(
        cand,
        payload_ds,
        None,
        payload_type=_PAYLOAD_TYPE,
        id_col=id_col,
        merge_partitions=merge_partitions,
        emit_fn=make_jaccard_stats_emit(tn, td),
    )


def make_jaccard_stats_emit(tn: int, td: int):
    """emit_fn for ``verify_edges_distributed``: per-pair exact overlap
    statistics (shared / size_a / size_b) via ONE flat lexsort over the
    partition's (pair, hash, side) triples, kept iff
    td*shared >= tn*union, jaccard one IEEE division. Shared by the
    prefix-filter and sorted-neighborhood joins."""

    def emit(m: pd.DataFrame) -> pd.DataFrame:
        cols = ["src", "dst", "shared", "size_a", "size_b"]
        if m.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in cols}
            ).assign(jaccard=pd.Series([], dtype=np.float64))
        A = [np.asarray(x, np.int64) for x in m["payload_a"]]
        B = [np.asarray(x, np.int64) for x in m["payload_b"]]
        na = np.fromiter((len(x) for x in A), np.int64, len(A))
        nb = np.fromiter((len(x) for x in B), np.int64, len(B))
        pid = np.concatenate(
            [np.repeat(np.arange(len(A)), na), np.repeat(np.arange(len(B)), nb)]
        )
        hh = np.concatenate(
            [np.concatenate(A) if na.sum() else np.empty(0, np.int64),
             np.concatenate(B) if nb.sum() else np.empty(0, np.int64)]
        )
        side = np.concatenate(
            [np.zeros(int(na.sum()), np.int64), np.ones(int(nb.sum()), np.int64)]
        )
        o = np.lexsort((side, hh, pid))
        p, h2, s2 = pid[o], hh[o], side[o]
        match = (
            (p[1:] == p[:-1]) & (h2[1:] == h2[:-1]) & (s2[:-1] == 0) & (s2[1:] == 1)
        )
        shared = np.bincount(p[:-1][match], minlength=len(A)).astype(np.int64)
        union = na + nb - shared
        keep = td * shared >= tn * union
        out = pd.DataFrame(
            {
                "src": m["src"].to_numpy(np.int64)[keep],
                "dst": m["dst"].to_numpy(np.int64)[keep],
                "shared": shared[keep],
                "size_a": na[keep],
                "size_b": nb[keep],
            }
        )
        out["jaccard"] = out["shared"].to_numpy(np.int64).astype(
            np.float64
        ) / (out["size_a"] + out["size_b"] - out["shared"]).to_numpy(
            np.int64
        ).astype(np.float64)
        return out

    return emit


def sorted_neighborhood_join(
    ds,
    *,
    window: int,
    threshold_num: int,
    threshold_den: int,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    merge_partitions: int = DEDUP_MERGE_PARTITIONS,
):
    """SORTED-NEIGHBORHOOD blocking join (Hernandez & Stolfo's
    merge/purge) — the THIRD candidate scheme of the dedup family
    (LSH = probabilistic, prefix filter = complete, SNM = locality):
    docs are globally ranked by a lexicographic sort key (the first 8
    bytes of the text as a big-endian integer — order-preserving for
    ASCII; contract: texts >= 8 chars, ASCII-clean, as this fixture
    guarantees), every pair within ``window`` ranks becomes a
    candidate, and candidates verify by EXACT shingle-Jaccard stats
    through the shared ``verify_edges_distributed`` router.

    The candidate set is DEFINED by the window (SQL mirrors it with
    ROW_NUMBER + a rank-distance self-join, so the oracle pins both
    the blocking and the verification); recall vs the complete join is
    the scheme's documented trade — near-dups that sort far apart are
    missed, which is why production runs multi-pass SNM with rotated
    keys.

    Distributed shape: exact global rank (the TeraSort-shaped
    histogram + range exchange in stages/rank), each row emitted to
    its rank-block and the next (any pair within ``window`` < block
    size shares a block), per-block vectorized pair explode, pair
    dedupe, shared verify. Returns (src, dst, shared, size_a, size_b,
    jaccard) with src < dst by id.
    """
    from abwcf_ray.stages.rank import global_rank

    tn, td = int(threshold_num), int(threshold_den)
    if not (0 < tn <= td):
        raise ValueError("threshold must be a fraction in (0, 1]")
    if window < 2:
        raise ValueError("window must be >= 2")
    W = int(window)

    payload_ds = ds.map_batches(
        _shingle_payload_stage(shingle_k, text_col, id_col),
        batch_format="pyarrow",
    ).materialize()

    def sort_key(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t.column(text_col).to_pylist()]
        keys = np.fromiter(
            (
                int.from_bytes(x.encode("utf-8")[:8].ljust(8, b"\x00"), "big")
                for x in texts
            ),
            np.uint64,
            len(texts),
        ).view(np.int64)
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                "skey": pa.array(keys),
            }
        )

    ranked = global_rank(
        ds.map_batches(sort_key, batch_format="pyarrow"),
        key_col="skey",
        id_col=id_col,
    )

    def to_blocks(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        blk = r // W
        return pa.table(
            {
                "blk": pa.array(np.concatenate([blk, blk + 1])),
                "r": pa.array(np.concatenate([r, r])),
                "doc": pa.array(np.concatenate([ids, ids])),
            }
        )

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        e = pd.Series([], dtype=np.int64)
        if len(g) < 2:
            return pd.DataFrame({"src": e, "dst": e})
        g = g.drop_duplicates(["blk", "r"]).sort_values(
            ["blk", "r"], kind="mergesort"
        )
        blk = g["blk"].to_numpy(np.int64)
        r = g["r"].to_numpy(np.int64)
        doc = g["doc"].to_numpy(np.int64)
        new = np.empty(len(g), bool)
        new[0] = True
        new[1:] = blk[1:] != blk[:-1]
        seg_start = np.flatnonzero(new)
        seg_len = np.diff(np.append(seg_start, len(g)))
        ai, bi = segment_pair_indices(seg_start, seg_len)
        keep = (r[bi] - r[ai]) < W
        lo = np.minimum(doc[ai][keep], doc[bi][keep])
        hi = np.maximum(doc[ai][keep], doc[bi][keep])
        return pd.DataFrame({"src": lo, "dst": hi}).drop_duplicates()

    cand = keyed_hash_agg(
        ranked.map_batches(to_blocks, batch_format="pyarrow"),
        lambda b: b.column("blk").to_numpy(zero_copy_only=False).view(
            np.uint64
        )
        * _GOLD,
        block_pairs,
        partitions=merge_partitions,
    )
    cand = keyed_hash_agg(
        cand,
        lambda b: (
            b.column("src").to_numpy(zero_copy_only=False).view(np.uint64)
            * _GOLD
            ^ b.column("dst").to_numpy(zero_copy_only=False).view(np.uint64)
        ),
        lambda g: g.drop_duplicates(["src", "dst"]),
        partitions=merge_partitions,
    )

    return verify_edges_distributed(
        cand,
        payload_ds,
        None,
        payload_type=_PAYLOAD_TYPE,
        id_col=id_col,
        merge_partitions=merge_partitions,
        emit_fn=make_jaccard_stats_emit(tn, td),
    )
