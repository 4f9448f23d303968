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
