"""Benchmark decontamination: drop training documents that share a word
k-gram with an evaluation/benchmark set (the GPT-3 / Pile / Llama training
hygiene step — typically k = 13 token n-grams).

Shape: the benchmark side is SMALL by definition (eval sets are MBs, not
TBs), so this is the canonical broadcast semi-join — the benchmark's
unique gram hashes are computed once on the driver, sorted, ``ray.put``
once, and every map task does a vectorized ``searchsorted`` membership
probe per batch. No shuffle of the corpus, no per-row Python: gram
hashing reuses the shared batch shingle kernel
(``dedup._batch_shingle_hashes`` — one hash64 call + k shifted-slice
passes per batch), membership is one searchsorted + bincount.

Gram identity is the 64-bit token-hash mix, not the joined string — two
gram occurrences match iff their token sequences match, up to a 64-bit
collision (the same measured-soundness argument as the ``ngram_dedup``
and ``minhash_dedup_exact`` oracles; the SQL oracle compares gram
STRINGS). Documents with 1 <= n_tokens < k contribute one gram over all
their tokens, mirroring the shingle kernel's short-doc rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def benchmark_gram_hashes(texts, k: int = 13) -> np.ndarray:
    """Sorted unique uint64 gram hashes of the benchmark texts (driver-side;
    benchmark sets are small)."""
    from abwcf_ray.stages.dedup import _batch_shingle_hashes

    C, _, _ = _batch_shingle_hashes([t or "" for t in texts], k)
    return np.unique(C)


def make_decontaminate_stage(bench_ref, k: int = 13, text_col: str = "text"):
    """map_batches stage: appends ``contaminated`` (bool — shares ≥1 gram
    with the benchmark) and ``n_grams`` (int64 — the doc's distinct gram
    count). ``bench_ref`` is a ``ray.ObjectRef`` to the sorted hash array
    (one shared copy per node) or the array itself (tests)."""
    import ray

    from abwcf_ray.stages.dedup import _batch_shingle_hashes

    def stage(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        texts = batch.column(text_col).to_pandas().astype("string").fillna("").tolist()
        C, sd, _ = _batch_shingle_hashes(texts, k)
        n_grams = np.bincount(sd, minlength=len(texts)) if len(sd) else np.zeros(
            len(texts), dtype=np.int64
        )
        hit = np.zeros(len(texts), dtype=bool)
        if len(C) and len(bench):
            pos = np.minimum(np.searchsorted(bench, C), len(bench) - 1)
            matched = bench[pos] == C
            if matched.any():
                hit[np.unique(sd[matched])] = True
        return batch.append_column(
            "contaminated", pa.array(hit)
        ).append_column("n_grams", pa.array(n_grams.astype(np.int64), pa.int64()))

    return stage


def decontaminate(ds, bench_texts, k: int = 13, text_col: str = "text"):
    """Return ``ds`` with contamination columns appended; filter on
    ``contaminated`` to drop flagged docs. ``bench_texts`` is an iterable of
    benchmark document texts (small — it is hashed on the driver and
    broadcast once)."""
    import ray

    bench = benchmark_gram_hashes(list(bench_texts), k)
    return ds.map_batches(
        make_decontaminate_stage(ray.put(bench), k, text_col),
        batch_format="pyarrow",
    )
