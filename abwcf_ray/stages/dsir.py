"""DSIR-style importance weighting and resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Given a small TARGET corpus (the domain you want more of) and the RAW
corpus, score every raw document by how much more likely its bag of
word n-grams is under the target's hashed-n-gram unigram model than
under the raw corpus's own:

    log w(x) = Σ_features c_x[b] · ( log p_target[b] − log q_raw[b] )

with features = word unigrams + bigrams hashed into ``m`` buckets and
Laplace smoothing on both models. Selection is Gumbel top-n on
``log w`` (importance resampling without replacement), with the Gumbel
noise derived deterministically from ``hash64(doc_id, seed)`` so the
selected set is invariant to block layout and parallelism — the same
determinism contract as ``stages/sample.py``'s Knuth keys.

Scale shape (everything bounded, nothing corpus-sized on the driver):

1. **Fit** (once per distribution): per-batch partial bucket counts →
   ``keyed_hash_agg`` merge → the driver assembles the dense ``m``-sized
   int64 vector (m = 65536 default → 512 KB, the LM-vocabulary bound).
2. **Score**: the float64 log-ratio weight vector is computed once on
   the driver and ``ray.put`` once; each batch computes every doc's
   ``log w`` with one flat hash pass + one segmented reduction. No
   shuffle.
3. **Resample**: per-block partial top-n prune (no block ever emits
   more than n rows) + bounded merge — the scheduler's two-level top-k
   shape.

Exactness & oracles: the float ``log w`` cannot hash-match SQL
(summation order), so the headline ``dsir`` query is pytest-verified
(brute-force parity) and rows-only at the gate, while ``dsir_counts``
— the same machinery degenerated to EXACT 64-bit gram hashes (no
modular bucketing) and integer hit-sums against both distributions —
carries a full DuckDB value oracle on gram STRINGS (the
``decontaminate``/``ngram_dedup`` 64-bit-collision soundness
contract). The bucketing step itself is pinned by a dense-bincount
reference test.

Reference anchor: the reference engine has no data-selection stage (it
is a crawler); this extends the training-data family per the build
brief, shaped after Xie et al. 2023 §2-3.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import (
    _FNV_OFFSET64,
    _FNV_PRIME64,
    keyed_hash_agg,
)

DEFAULT_BUCKETS = 65_536


def _batch_gram_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """All word unigram + bigram hashes for a batch, WITH multiplicity
    (DSIR is a bag model — unlike the dedup shingle kernel, which
    dedups per doc). One ``hash64`` call over the flat token list, one
    shifted-slice FNV combine for bigrams. Returns (gram hashes, doc
    index per gram)."""
    tok_lists = [t.split() if t else [] for t in texts]
    lens = np.array([len(x) for x in tok_lists], dtype=np.int64)
    flat = [w for ts in tok_lists for w in ts]
    if not flat:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    H = hash64(flat)
    doc_of_tok = np.repeat(np.arange(len(texts), dtype=np.int64), lens)

    # bigrams: adjacent token pairs within a doc
    bi_counts = np.maximum(lens - 1, 0)
    total_bi = int(bi_counts.sum())
    if total_bi:
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        seg = np.concatenate([[0], np.cumsum(bi_counts)])[:-1]
        within = np.arange(total_bi, dtype=np.int64) - np.repeat(seg, bi_counts)
        ws = np.repeat(starts, bi_counts) + within
        B = np.full(total_bi, _FNV_OFFSET64, dtype=np.uint64)
        B = (B ^ H[ws]) * _FNV_PRIME64
        B = (B ^ H[ws + 1]) * _FNV_PRIME64
        doc_of_bi = np.repeat(np.arange(len(texts), dtype=np.int64), bi_counts)
        return np.concatenate([H, B]), np.concatenate([doc_of_tok, doc_of_bi])
    return H, doc_of_tok


def fit_bucket_counts(ds, *, m: int = DEFAULT_BUCKETS, text_col: str = "text"):
    """One bounded pass: dense int64 bucket-count vector (length m) of the
    dataset's hashed-gram distribution. Exchange is O(distinct buckets per
    batch) sparse pairs through a keyed merge; the driver holds only the
    m-vector."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        g, _ = _batch_gram_hashes(texts)
        b = (g % np.uint64(m)).astype(np.int64)
        k = np.bincount(b, minlength=0)
        nz = np.flatnonzero(k)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(k[nz].astype(np.int64), pa.int64()),
            }
        )

    agg = keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda b: b.column("bucket").to_numpy(zero_copy_only=False),
        lambda g: g.groupby("bucket", as_index=False).agg(n=("n", "sum")),
    )
    out = np.zeros(m, np.int64)
    for b in agg.iter_batches(batch_format="pyarrow"):
        out[b.column("bucket").to_numpy(zero_copy_only=False)] = b.column(
            "n"
        ).to_numpy(zero_copy_only=False)
    return out


def dsir_log_weights(
    target_counts: np.ndarray, raw_counts: np.ndarray
) -> np.ndarray:
    """Per-bucket log importance ratio with Laplace smoothing:
    log((tc+1)/(T+m)) − log((rc+1)/(R+m))."""
    m = len(target_counts)
    t_tot = float(target_counts.sum()) + m
    r_tot = float(raw_counts.sum()) + m
    return np.log((target_counts + 1.0) / t_tot) - np.log(
        (raw_counts + 1.0) / r_tot
    )


def add_dsir_logw(ds, w_ref, *, m: int = DEFAULT_BUCKETS, text_col: str = "text"):
    """Append ``n_grams`` and ``dsir_logw`` per document — one flat hash
    pass + one segmented sum per batch against the broadcast weight
    vector; no shuffle."""
    import ray

    def stage(batch: pa.Table) -> pa.Table:
        w = ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else w_ref
        texts = batch.column(text_col).to_pylist()
        g, doc = _batch_gram_hashes(texts)
        b = (g % np.uint64(m)).astype(np.int64)
        logw = np.zeros(len(texts), np.float64)
        np.add.at(logw, doc, w[b])
        n_grams = np.bincount(doc, minlength=len(texts)).astype(np.int64)
        return batch.append_column(
            "n_grams", pa.array(n_grams, pa.int64())
        ).append_column("dsir_logw", pa.array(logw, pa.float64()))

    return ds.map_batches(stage, batch_format="pyarrow")


def _gumbel01(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-id Gumbel(0,1) noise via a splitmix64 finalizer
    of (id + seed·golden) — layout/parallelism invariant, reproducible
    across runs (hash64 is a string kernel; this stays numeric)."""
    x = ids.astype(np.uint64) + np.uint64((seed * 0x9E3779B97F4A7C15) & (2**64 - 1))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    u = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u = np.clip(u, 1e-300, 1.0 - 1e-16)
    return -np.log(-np.log(u))


def dsir_resample(
    ds_scored,
    n: int,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    temperature: float = 1.0,
):
    """Gumbel top-n on ``dsir_logw / temperature``: importance resampling
    without replacement. Exact and deterministic: per-block partial top-n
    prune (ties broken by id asc), bounded merge on the driver (≤ n rows
    per block cross the exchange — the scheduler's two-level shape).
    Returns a pandas DataFrame of the selected rows sorted by key desc."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        logw = batch.column("dsir_logw").to_numpy(zero_copy_only=False)
        key = logw / temperature + _gumbel01(ids, seed)
        if len(ids) > n:
            order = np.lexsort((ids, -key))[:n]
            batch = batch.take(pa.array(np.sort(order), pa.int64()))
            key = key[np.sort(order)]
        return batch.append_column("_gkey", pa.array(key, pa.float64()))

    parts = ds_scored.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["_gkey", id_col], ascending=[False, True], kind="mergesort"
    ).head(n)
    return parts.drop(columns=["_gkey"]).reset_index(drop=True)


def dsir_exact_hits(ds, target_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """SQL-oracle degeneration of the DSIR machinery: EXACT 64-bit gram
    hashes (no modular bucketing) and integer hit sums. Per raw document:
    ``target_hits`` = Σ over its grams of that gram's count in the TARGET
    corpus, ``raw_hits`` = same against the RAW corpus, plus ``n_grams``
    — all exact int64, so DuckDB can mirror it on gram STRINGS. The fit
    pass, the per-doc gram kernel, and the broadcast-probe scoring are
    the same code paths the bucketed scorer uses."""
    import ray

    def fit_exact(d):
        def partial(batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            g, _ = _batch_gram_hashes(texts)
            if not len(g):
                return pa.table(
                    {
                        "gram": pa.array([], pa.uint64()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            k, v = np.unique(g, return_counts=True)
            return pa.table(
                {
                    "gram": pa.array(k, pa.uint64()),
                    "n": pa.array(v.astype(np.int64), pa.int64()),
                }
            )

        agg = keyed_hash_agg(
            d.map_batches(partial, batch_format="pyarrow"),
            lambda b: b.column("gram").to_numpy(zero_copy_only=False),
            lambda g: g.groupby("gram", as_index=False).agg(n=("n", "sum")),
        )
        frames = [
            b.to_pandas() for b in agg.iter_batches(batch_format="pyarrow")
        ]
        df = (
            pd.concat(frames)
            if frames
            else pd.DataFrame({"gram": [], "n": []})
        )
        df = df.sort_values("gram")
        return (
            df["gram"].to_numpy(dtype=np.uint64),
            df["n"].to_numpy(dtype=np.int64),
        )

    t_grams, t_counts = fit_exact(target_ds)
    r_grams, r_counts = fit_exact(ds)
    ref = ray.put((t_grams, t_counts, r_grams, r_counts))

    def score(batch: pa.Table) -> pa.Table:
        tg, tc, rg, rc = ray.get(ref)
        texts = batch.column(text_col).to_pylist()
        g, doc = _batch_gram_hashes(texts)
        n_docs = batch.num_rows

        def hits(sorted_grams, counts):
            if not len(sorted_grams) or not len(g):
                return np.zeros(n_docs, np.int64)
            pos = np.minimum(
                np.searchsorted(sorted_grams, g), len(sorted_grams) - 1
            )
            per_gram = np.where(sorted_grams[pos] == g, counts[pos], 0)
            out = np.zeros(n_docs, np.int64)
            np.add.at(out, doc, per_gram)
            return out

        n_grams = (
            np.bincount(doc, minlength=n_docs).astype(np.int64)
            if len(g)
            else np.zeros(n_docs, np.int64)
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_grams": pa.array(n_grams, pa.int64()),
                "target_hits": pa.array(hits(tg, tc), pa.int64()),
                "raw_hits": pa.array(hits(rg, rc), pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
