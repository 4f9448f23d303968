"""Term co-occurrence matrix over a document corpus — the statistics
build that feeds PMI vocabularies, GloVe-style embedding training and
topic seeding (reference analog: the per-page token statistics the
sink-side consumers compute over extracted text; this generalizes
them to pairwise counts).

Semantics (mirrored exactly by the SQL oracle): tokenize
``lower(text)`` with a token regex, take each document's DISTINCT
token set, and count for every unordered token pair (w1 < w2
lexicographically) the number of documents containing both. Document
frequency of a pair — not positional windows — is the standard
"document co-occurrence" used for PMI over short web documents.

Scale shape:

- The pair explode is **map-side** and fully vectorized: one pandas
  ``findall`` + explode per batch, per-doc distinct via one
  ``drop_duplicates``, then ``segment_pair_indices`` (shared with the
  fuzzy-join band buckets) turns every within-doc combination into two
  flat gather arrays — no per-document Python loop.
- Each batch PRE-AGGREGATES its pairs (one vectorized groupby) before
  the exchange, so shuffle volume is bounded by the batch's distinct
  pair count, not its raw pair count.
- The global merge is ONE ``keyed_hash_agg`` exchange on
  ``hash(w1, w2) % P`` — the high-cardinality pair domain never hits
  Ray's native sort-shuffle groupby.
- Per-doc cost is O(d^2) in the distinct-token count d; web pages cap
  it with ``max_doc_terms`` (keep each doc's lexicographically first k
  terms — deterministic, documented truncation; the oracle queries run
  uncapped).

``min_count`` prunes the long singleton tail AFTER the global merge
(correct counts), which is where a 100-TB corpus sheds ~90% of output
rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import keyed_hash_agg
from abwcf_ray.stages.fuzzy import segment_pair_indices

_EMPTY = pa.table(
    {
        "w1": pa.array([], pa.string()),
        "w2": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
    }
)


def _pair_partials(
    token_re: str, text_col: str, max_doc_terms: int | None
):
    """Per-batch map: text -> pre-aggregated (w1, w2, n) pair partials."""

    def explode(t: pa.Table) -> pa.Table:
        toks = (
            t.column(text_col)
            .to_pandas()
            .str.lower()
            .str.findall(token_re)
            .explode()
            .dropna()
        )
        if len(toks) == 0:
            return _EMPTY
        df = pd.DataFrame(
            {"d": toks.index.to_numpy(np.int64), "w": toks.to_numpy()}
        ).drop_duplicates()
        # sort (doc, token): segments are docs, tokens ascending within
        # each — so gather pairs (i < j) are already (w1 < w2)
        df = df.sort_values(["d", "w"], kind="stable", ignore_index=True)
        d = df["d"].to_numpy()
        new = np.r_[True, d[1:] != d[:-1]]
        seg_start = np.flatnonzero(new)
        seg_len = np.diff(np.r_[seg_start, len(d)])
        if max_doc_terms is not None:
            seg_len = np.minimum(seg_len, max_doc_terms)
        ai, bi = segment_pair_indices(seg_start, seg_len)
        if len(ai) == 0:
            return _EMPTY
        w = df["w"].to_numpy()
        part = (
            pd.DataFrame({"w1": w[ai], "w2": w[bi]})
            .groupby(["w1", "w2"], sort=False)
            .size()
            .reset_index(name="n")
        )
        part["n"] = part["n"].astype(np.int64)
        return pa.Table.from_pandas(part, preserve_index=False)

    return explode


def _pair_key(b: pa.Table) -> np.ndarray:
    return hash64(b.column("w1")) * np.uint64(0x9E3779B97F4A7C15) ^ hash64(
        b.column("w2")
    )


def cooccurrence(
    docs,
    *,
    text_col: str = "text",
    token_re: str = r"[a-z]{4,}",
    min_count: int = 2,
    max_doc_terms: int | None = None,
    partitions: int | None = None,
):
    """Document co-occurrence counts: Dataset of (w1, w2, n) for every
    unordered distinct-token pair appearing together in >= ``min_count``
    documents. One map-side explode+partial per batch, ONE keyed
    exchange."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["w1", "w2"], as_index=False, sort=False)["n"].sum()
        return m[m["n"] >= min_count]

    return keyed_hash_agg(
        docs.map_batches(
            _pair_partials(token_re, text_col, max_doc_terms),
            batch_format="pyarrow",
        ),
        _pair_key,
        merge,
        partitions=partitions,
    )


def cooccurrence_lift(
    docs,
    *,
    text_col: str = "text",
    token_re: str = r"[a-z]{4,}",
    min_count: int = 2,
    max_doc_terms: int | None = None,
    partitions: int | None = None,
):
    """Co-occurrence with association strength: lift = n_docs * n(w1,w2)
    / (df(w1) * df(w2)) — the PMI argument before the log, emitted as ONE
    IEEE division of two exact int64 products so the value hash-matches
    SQL bit-for-bit (the repetition_signals float discipline).

    Term document frequencies are a second keyed aggregate whose output
    (the distinct VOCABULARY, orders of magnitude smaller than the pair
    table) is collected and broadcast into the pair partitions as a dict
    lookup — a 10^7-term web vocabulary is ~100 MB broadcast once via the
    object store, vs. re-shuffling the full pair table twice for a join.
    """
    import ray

    n_docs = docs.count()

    def _doc_terms(t: pa.Table) -> pa.Table:
        toks = (
            t.column(text_col)
            .to_pandas()
            .str.lower()
            .str.findall(token_re)
            .explode()
            .dropna()
        )
        if len(toks) == 0:
            return pa.table(
                {"w": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        part = (
            pd.DataFrame(
                {"d": toks.index.to_numpy(np.int64), "w": toks.to_numpy()}
            )
            .drop_duplicates()
            .groupby("w", sort=False)
            .size()
            .reset_index(name="df")
        )
        part["df"] = part["df"].astype(np.int64)
        return pa.Table.from_pandas(part, preserve_index=False)

    dfs = keyed_hash_agg(
        docs.map_batches(_doc_terms, batch_format="pyarrow"),
        lambda b: hash64(b.column("w")),
        lambda g: g.groupby("w", as_index=False, sort=False)["df"].sum(),
        partitions=partitions,
    ).to_pandas()
    df_ref = ray.put(dict(zip(dfs["w"], dfs["df"].astype(np.int64))))

    pairs = cooccurrence(
        docs,
        text_col=text_col,
        token_re=token_re,
        min_count=min_count,
        max_doc_terms=max_doc_terms,
        partitions=partitions,
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(df_ref)
        d1 = g["w1"].map(lut).to_numpy(np.int64)
        d2 = g["w2"].map(lut).to_numpy(np.int64)
        out = g.copy()
        # exact int64 numerator/denominator, ONE rounding at the division
        out["lift"] = (g["n"].to_numpy(np.int64) * np.int64(n_docs)).astype(
            np.float64
        ) / (d1 * d2).astype(np.float64)
        return out

    return pairs.map_batches(attach, batch_format="pandas")
