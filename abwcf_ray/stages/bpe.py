"""BPE-style adjacent character-pair statistics over a text corpus.

The counting core of byte-pair-encoding tokenizer training: for every
adjacent character pair inside each document, the global occurrence
count — the quantity a BPE trainer maximizes when picking its next
merge. (The reference's sink-side consumers compute per-page token
statistics over extracted text; this is the tokenizer-training analog a
100-TB LLM data pipeline runs over the whole corpus.)

Semantics (mirrored exactly by the SQL oracle): pairs are consecutive
UNICODE CODEPOINTS within a document (positional, overlapping — the
string "aaa" contributes ("a","a") twice); pairs never span documents.
Top-k pairs are ranked by (count DESC, c1, c2) with the character
tie-break in codepoint order (= UTF-8 binary order, what SQL string
ORDER BY uses).

Scale shape — no per-document Python, no per-character Python:

- Each batch joins its documents with a NUL sentinel, decodes ONCE to a
  uint32 codepoint array (``encode('utf-32-le')`` + ``frombuffer`` —
  one C pass), forms all adjacent pairs as one shifted 64-bit view, and
  pre-aggregates with ``np.unique`` — shuffle volume is the batch's
  DISTINCT pair count (bounded by ~alphabet², tiny), never its
  character count.
- The global merge is ONE ``keyed_hash_agg`` exchange on hash(pair).
- Top-k via the standard pruned two-level ``topk_per_group`` (each
  block pre-prunes to k rows by the same total order the merge uses).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import keyed_hash_agg
from abwcf_ray.stages.sample import topk_per_group

_SENTINEL = 0  # NUL joins documents; pairs touching it are dropped


def _pair_partial(text_col: str):
    def f(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        if not texts:
            return pa.table(
                {"pair": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        joined = "\x00".join(x if x is not None else "" for x in texts)
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        if len(cp) < 2:
            return pa.table(
                {"pair": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        hi, lo = cp[:-1], cp[1:]
        valid = (hi != _SENTINEL) & (lo != _SENTINEL)
        key = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
        uniq, counts = np.unique(key[valid], return_counts=True)
        return pa.table(
            {
                # codepoints < 2^21, so the packed pair fits int64 exactly
                "pair": pa.array(uniq.astype(np.int64), pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return f


def char_pair_counts(
    ds,
    *,
    text_col: str = "text",
    k: int = 50,
    merge_partitions: int = 16,
):
    """Global top-``k`` adjacent codepoint pairs over ``text_col``.
    Returns a Dataset with ``(c1, c2, n)``: the pair's two characters
    (1-codepoint strings) and its corpus-wide occurrence count, the
    exact top-k by (n DESC, c1, c2)."""
    partials = ds.map_batches(_pair_partial(text_col), batch_format="pyarrow")
    merged = keyed_hash_agg(
        partials,
        lambda b: b.column("pair").to_numpy(zero_copy_only=False),
        lambda g: g.groupby("pair", as_index=False).agg(n=("n", "sum")),
        partitions=merge_partitions,
    ).map_batches(
        lambda t: t.append_column(
            "g", pa.array(np.zeros(t.num_rows, np.int64))
        ),
        batch_format="pyarrow",
    )
    # ascending packed-pair order == (c1, c2) codepoint-lexicographic
    top = topk_per_group(
        merged, k, group_col="g", score_col="n", id_col="pair"
    )

    def decode(t: pa.Table) -> pa.Table:
        pair = t.column("pair").to_numpy(zero_copy_only=False).astype(np.uint64)
        c1 = [chr(int(p >> np.uint64(32))) for p in pair]
        c2 = [chr(int(p & np.uint64(0xFFFFFFFF))) for p in pair]
        return pa.table(
            {
                "c1": pa.array(c1, pa.string()),
                "c2": pa.array(c2, pa.string()),
                "n": t.column("n"),
            }
        )

    return top.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Full BPE training: the iterative merge loop. Each round counts pairs
# over the CURRENT symbol sequences (same distinct-bounded exchange as
# char_pair_counts), takes the global argmax (count DESC, pair ASC —
# deterministic), broadcasts the winning pair, and applies the merge
# corpus-wide as one vectorized pass (greedy left-to-right,
# non-overlapping — the standard BPE application order). New symbol ids
# are allocated from 0x110000 (above the unicode range) upward.
# ---------------------------------------------------------------------------

_NEW_ID_BASE = 0x110000


def _flat_codepoints(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Documents -> (flat int64 codepoint values, int64 doc offsets).
    In-text NUL codepoints are DROPPED (NUL doubles as the join sentinel;
    stripping it first keeps the offsets aligned with the kept symbols —
    a stray NUL in crawl-extracted text would otherwise silently shift
    every later document's boundary)."""
    texts = [(x or "").replace("\x00", "") for x in texts]
    joined = "\x00".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    lens = np.array([len(x) for x in texts], np.int64)
    keep = cp != _SENTINEL  # only the join sentinels remain
    offsets = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    return cp[keep], offsets


def _syms_of_text(text_col: str):
    """text -> (syms list<int64>) initial symbol sequences."""

    def f(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        v, offsets = _flat_codepoints(texts)
        return pa.table(
            {
                "syms": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()).cast(pa.int32()),
                    pa.array(v, pa.int64()),
                )
            }
        )

    return f


def _list_parts(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (values, offsets) of the ``syms`` list column."""
    col = t.column("syms")
    chunk = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = chunk.values.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = chunk.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return values, offsets


def _pair_partial_syms(t: pa.Table) -> pa.Table:
    v, offsets = _list_parts(t)
    if len(v) < 2:
        return pa.table(
            {"pair": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
    valid = np.ones(len(v) - 1, bool)
    # a document's last symbol cannot start a pair
    ends = offsets[1:] - 1
    valid[ends[(ends >= 0) & (ends < len(valid))]] = False
    key = (v[:-1].astype(np.uint64) << np.uint64(32)) | v[1:].astype(
        np.uint64
    )
    uniq, counts = np.unique(key[valid], return_counts=True)
    return pa.table(
        {
            "pair": pa.array(uniq.astype(np.int64), pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def _greedy_select(idx: np.ndarray) -> np.ndarray:
    """Greedy left-to-right non-overlapping subset of match positions:
    within each run of CONSECUTIVE indices keep every other one (runs
    only occur when left==right, e.g. 'aaaa'); vectorized."""
    if len(idx) == 0:
        return idx
    run_start = np.r_[True, np.diff(idx) != 1]
    run_id = np.cumsum(run_start) - 1
    first = idx[run_start]
    return idx[(idx - first[run_id]) % 2 == 0]


def _merge_pass(
    v: np.ndarray, offsets: np.ndarray, a: int, b: int, new_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """ONE simultaneous-match + greedy-every-other application of merge
    (a, b) -> new_id over flattened (values, offsets) doc sequences —
    the single kernel shared by training (_apply_merge) and encoding
    (bpe_encode), so train-then-encode reproduces training exactly.
    Returns the (possibly unchanged) (values, offsets)."""
    if len(v) < 2:
        return v, offsets
    m = (v[:-1] == a) & (v[1:] == b)
    ends = offsets[1:] - 1
    ends = ends[(ends >= 0) & (ends < len(m))]
    m[ends] = False  # a document's last symbol cannot start a pair
    sel = _greedy_select(np.flatnonzero(m))
    if len(sel) == 0:
        return v, offsets
    out = v.copy()
    out[sel] = new_id
    keep = np.ones(len(v), bool)
    keep[sel + 1] = False
    # each doc shrinks by its selected-merge count
    per_doc = np.diff(np.searchsorted(sel, offsets))
    new_offsets = offsets - np.cumsum(np.r_[0, per_doc])[: len(offsets)]
    return out[keep], new_offsets


def _apply_merge(a: int, b: int, new_id: int):
    def f(t: pa.Table) -> pa.Table:
        v, offsets = _list_parts(t)
        nv, noff = _merge_pass(v, offsets, a, b, new_id)
        if nv is v:
            return t
        return pa.table(
            {
                "syms": pa.ListArray.from_arrays(
                    pa.array(noff, pa.int32()).cast(pa.int32()),
                    pa.array(nv, pa.int64()),
                )
            }
        )

    return f


def bpe_train(
    ds,
    *,
    text_col: str = "text",
    n_merges: int = 8,
    merge_partitions: int = 16,
) -> pd.DataFrame:
    """Train ``n_merges`` BPE merges over the corpus. Returns the merge
    table as a pandas DataFrame (it is O(n_merges), driver-small by
    construction): ``step, left_tok, right_tok, token, count`` — the
    merged pair's token strings and its corpus count at selection time.

    Each round is one distributed pair-count (map-side ``np.unique``
    partials, one keyed exchange, pruned top-1) + one vectorized
    corpus-wide merge application, with the corpus re-materialized per
    round (the PageRank iteration idiom). Deterministic: ties on count
    break on ascending packed pair id = (left, right) codepoint order.

    Stops early when no pair occurs at least twice (merging singleton
    pairs is pure vocabulary noise). ``char_pair_counts`` is the
    SQL-oracled degeneration of round 1 (its top-1 is the first merge).
    """
    corpus = ds.map_batches(_syms_of_text(text_col), batch_format="pyarrow")
    corpus = corpus.materialize()

    tok: dict[int, str] = {}

    def tok_of(sym: int) -> str:
        return tok[sym] if sym in tok else chr(sym)

    rows = []
    for step in range(n_merges):
        partials = corpus.map_batches(
            _pair_partial_syms, batch_format="pyarrow"
        )
        merged = keyed_hash_agg(
            partials,
            lambda bt: bt.column("pair").to_numpy(zero_copy_only=False),
            lambda g: g.groupby("pair", as_index=False).agg(n=("n", "sum")),
            partitions=merge_partitions,
        ).map_batches(
            lambda t: t.append_column(
                "g", pa.array(np.zeros(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
        )
        top = topk_per_group(
            merged, 1, group_col="g", score_col="n", id_col="pair"
        ).take(1)
        if not top or top[0]["n"] < 2:
            break
        pair = np.uint64(top[0]["pair"])
        a = int(pair >> np.uint64(32))
        b = int(pair & np.uint64(0xFFFFFFFF))
        new_id = _NEW_ID_BASE + step
        tok[new_id] = tok_of(a) + tok_of(b)
        rows.append(
            {
                "step": step,
                "left_tok": tok_of(a),
                "right_tok": tok_of(b),
                "token": tok[new_id],
                "count": int(top[0]["n"]),
                "left_id": a,
                "right_id": b,
                "new_id": new_id,
            }
        )
        corpus = corpus.map_batches(
            _apply_merge(a, b, new_id), batch_format="pyarrow"
        ).materialize()

    return pd.DataFrame(
        rows,
        columns=[
            "step",
            "left_tok",
            "right_tok",
            "token",
            "count",
            "left_id",
            "right_id",
            "new_id",
        ],
    )


def bpe_encode(
    ds,
    merges,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Tokenize the corpus with a TRAINED merge table: apply each merge
    (``left_id``, ``right_id`` -> ``new_id`` rows of :func:`bpe_train`'s
    output, in step order) to every document, return one row per doc:
    ``(id_col, n_tokens)`` — the token count under the trained BPE vocab.

    Distributed shape: the merge table is O(n_merges) and rides in the
    task closure; encoding is ONE stateless ``map_batches`` pass — each
    batch decodes to a codepoint array once and replays all M merges
    with the same vectorized simultaneous-match + greedy-every-other
    kernel training used (``_apply_merge``), so train-then-encode of the
    training corpus reproduces training's final symbol sequences
    exactly. No exchange; retries are pure.

    Single-pass-per-merge completeness: a merge's pair can never
    re-form after any other merge (a replacement only creates
    adjacencies INVOLVING its fresh id, and fresh ids are never a
    later pair's member unless recorded as such in a later row), so
    one greedy pass per merge in step order is the exact classic BPE
    encode.
    """
    trip = [
        (int(a), int(b), int(n))
        for a, b, n in zip(
            merges["left_id"], merges["right_id"], merges["new_id"]
        )
    ]

    def encode(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        v, offsets = _flat_codepoints(texts)
        for a, b, nid in trip:
            if len(v) < 2:
                break
            v, offsets = _merge_pass(v, offsets, a, b, nid)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pa.array(np.diff(offsets), pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")
