"""Corpus-level unigram language-model rarity scoring (the CCNet-style
quality dimension: score every document against a language model of the
corpus and bucket it head / middle / tail — Wenzek et al. 2020 §4.3 use a
KenLM 5-gram; at 100 TB the same *shape* works with the model this engine
can build from its own corpus in one bounded pass: the unigram frequency
table).

Two passes, both Ray-native and bounded:

1. **Vocabulary build** — per-batch partial word counts (exchange =
   distinct words per batch, the classic combiner), one vocabulary-sized
   ``groupby(word).sum`` + sort, top-``vocab_size`` rows to the driver.
   The exchange is O(vocabulary), never O(corpus): web-scale vocabularies
   are ~10^8 rows where the corpus is 10^13 tokens.
2. **Scoring** — the vocabulary broadcasts ONCE (``ray.put`` of a sorted
   uint64 hash array + a parallel rank array, the same zero-copy
   broadcast-probe shape as ``stages/decontam.py``); every map task scores
   its batches with one ``hash64`` call + one ``searchsorted`` probe. No
   shuffle of the corpus.

The score is deliberately integer-exact so the SQL oracle can hash-match
it: each token contributes its vocabulary RANK (1 = most frequent;
out-of-vocabulary tokens contribute ``vocab_size + 1``), ranks assigned by
(count DESC, word ASC) — ``row_number()`` order in SQL. ``rank_sum`` and
``n_lm_tokens`` are exact int64 sums; ``mean_rank`` is the single IEEE
division ``rank_sum / max(n, 1)`` (bit-identical on both sides, the same
trick as ``add_repetition_signals``); the head/middle/tail bucket is two
comparisons on that double. A true log-probability column would hash-drift
between numpy's and DuckDB's ``log2`` at the last ulp — rank rarity keeps
the operator value (rare-word-heavy documents score high, boilerplate
scores low) with none of the float fragility.

Token identity inside the engine is the 64-bit ``hash64`` of the token
(the oracle compares token STRINGS) — the same measured-soundness argument
as ``stages/decontam.py``: a collision between one of ``vocab_size``
vocabulary hashes and one of the corpus' distinct-token hashes flips a
rank with probability ~ V·D / 2^64 (≈ 10^-8 even at V = 10^5, D = 10^7).

Reference anchor: the reference engine has no LM scoring (it is a crawler);
this operator extends the training-data family per the build brief, shaped
after CCNet (Wenzek et al. 2020) and the Gopher quality pipeline (Rae et
al. 2021 §A1.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_VOCAB_SIZE = 65_536


def _partial_word_counts(text_col: str):
    """map_batches stage: (word, n) partial counts for one batch — the
    map-side combiner that bounds the vocabulary exchange."""

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas().astype("string").fillna("")
        flat = [w for t in texts for w in t.split()]
        if not flat:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        vc = pd.Series(flat).value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64), pa.int64()),
            }
        )

    return stage


def build_vocab(ds, vocab_size: int = DEFAULT_VOCAB_SIZE, text_col: str = "text"):
    """Top-``vocab_size`` corpus words by (count DESC, word ASC) →
    driver-side list[(word, rank)] with rank 1..V. The sort runs over the
    AGGREGATED count table (vocabulary-sized), never over token rows."""
    from abwcf_ray.functions.hashing import hash64
    from abwcf_ray.stages.dedup import keyed_hash_agg

    counts = keyed_hash_agg(
        ds.map_batches(_partial_word_counts(text_col), batch_format="pyarrow"),
        lambda b: hash64(b.column("word")),
        lambda g: g.groupby("word", as_index=False).agg(cnt=("n", "sum")),
    )
    top = counts.sort(["cnt", "word"], descending=[True, False]).limit(vocab_size)
    df = top.to_pandas()
    return list(df["word"]), len(df)


def make_rank_score_stage(vocab_ref, vocab_size: int, *, text_col: str = "text",
                          head_max: float, mid_max: float):
    """map_batches stage appending ``n_lm_tokens``, ``rank_sum``,
    ``mean_rank``, ``lm_bucket``. ``vocab_ref`` is a ``ray.ObjectRef`` to
    (sorted uint64 token-hash array, parallel int64 rank array) — or the
    tuple itself in tests."""
    import ray

    from abwcf_ray.functions.hashing import hash64

    oov_rank = np.int64(vocab_size + 1)

    def stage(batch: pa.Table) -> pa.Table:
        hs, ranks = (
            ray.get(vocab_ref) if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref
        )
        texts = batch.column(text_col).to_pandas().astype("string").fillna("")
        tok_lists = [t.split() for t in texts]
        lens = np.array([len(x) for x in tok_lists], dtype=np.int64)
        flat = [w for ts in tok_lists for w in ts]
        if flat:
            H = hash64(flat)
            if hs.size:
                pos = np.minimum(np.searchsorted(hs, H), hs.size - 1)
                tok_rank = np.where(hs[pos] == H, ranks[pos], oov_rank)
            else:
                tok_rank = np.full(H.size, oov_rank)
            doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
            rank_sum = np.bincount(
                doc_idx, weights=tok_rank.astype(np.float64), minlength=len(texts)
            ).astype(np.int64)
        else:
            rank_sum = np.zeros(len(texts), dtype=np.int64)
        mean_rank = rank_sum / np.maximum(lens, 1)  # single IEEE division
        bucket = np.where(
            mean_rank <= head_max, "head", np.where(mean_rank <= mid_max, "middle", "tail")
        )
        return (
            batch.append_column("n_lm_tokens", pa.array(lens, pa.int64()))
            .append_column("rank_sum", pa.array(rank_sum, pa.int64()))
            .append_column("mean_rank", pa.array(mean_rank, pa.float64()))
            .append_column("lm_bucket", pa.array(bucket.tolist(), pa.string()))
        )

    return stage


def lm_rarity_score(
    ds,
    *,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    head_max: float = 14.0,
    mid_max: float = 16.5,
    text_col: str = "text",
):
    """Score ``ds`` against a unigram LM of ITSELF (the CCNet shape with
    the corpus as its own reference model): appends per-doc rank-rarity
    columns + head/middle/tail bucket. Two bounded passes; the corpus is
    never shuffled."""
    import ray

    from abwcf_ray.functions.hashing import hash64

    words, n_vocab = build_vocab(ds, vocab_size, text_col)
    if n_vocab:
        H = hash64(words)
        order = np.argsort(H, kind="stable")
        payload = (H[order], (np.arange(n_vocab, dtype=np.int64) + 1)[order])
    else:
        payload = (np.zeros(0, np.uint64), np.zeros(0, np.int64))
    return ds.map_batches(
        make_rank_score_stage(
            ray.put(payload), vocab_size, text_col=text_col,
            head_max=head_max, mid_max=mid_max,
        ),
        batch_format="pyarrow",
    )


def top_keywords(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 max_vocab_broadcast: int = 50_000_000):
    """TF-IDF-style keyword extraction, integer-exact: per document the
    token maximizing (term frequency DESC, corpus document-frequency ASC,
    token ASC) — the rarest of its most-repeated words. Integer ordering
    instead of a float tf·idf score for the same reason as
    :func:`lm_rarity_score`: the SQL oracle hash-matches (the float score
    would drift at the last ulp), and the ranking it induces per document
    is identical whenever idf is monotone in df (it is).

    Two bounded passes: (1) corpus document frequencies — per-batch
    distinct (word → n docs) partials, keyed merge, broadcast once as a
    sorted (hash, df) pair (O(vocabulary), the ``build_vocab`` bound;
    ``max_vocab_broadcast`` guards the driver); (2) per-batch tf +
    searchsorted df attach + one vectorized 3-key sort / head(1) per doc.
    Documents with no tokens emit no row (the SQL inner-join semantics).
    """
    import ray

    from abwcf_ray.stages.dedup import keyed_hash_agg

    def df_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas().astype("string").fillna("")
        words = texts.str.findall(r"\S+")
        ex = words.explode().dropna()
        if not len(ex):
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        pairs = pd.DataFrame(
            {"d": ex.index.to_numpy(), "w": ex.to_numpy(dtype=object)}
        ).drop_duplicates()
        vc = pairs["w"].value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64), pa.int64()),
            }
        )

    from abwcf_ray.functions.hashing import hash64

    dfs_ds = keyed_hash_agg(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        lambda b: hash64(b.column("word")),
        lambda g: g.groupby("word", as_index=False).agg(n=("n", "sum")),
    ).materialize()
    # gate BEFORE pulling the vocabulary to the driver — checking after
    # .to_pandas() cannot prevent the OOM the bound exists for
    n_vocab = dfs_ds.count()
    if n_vocab > max_vocab_broadcast:
        raise ValueError(
            f"{n_vocab} distinct words exceed max_vocab_broadcast; raise the"
            " bound or pre-truncate the vocabulary (build_vocab)"
        )
    dfs = dfs_ds.to_pandas()
    wh = hash64(dfs["word"].tolist()) if len(dfs) else np.zeros(0, np.uint64)
    order = np.argsort(wh, kind="stable")
    payload = (wh[order], dfs["n"].to_numpy(np.int64)[order])
    ref = ray.put(payload)

    def pick(batch: pa.Table) -> pa.Table:
        hs, dfv = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        texts = batch.column(text_col).to_pandas().astype("string").fillna("")
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        words = texts.str.findall(r"\S+")
        ex = words.explode().dropna()
        if not len(ex):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "keyword": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        t = (
            pd.DataFrame(
                {"row": ex.index.to_numpy(), "word": ex.to_numpy(dtype=object)}
            )
            .groupby(["row", "word"], as_index=False)
            .size()
        )
        t.columns = ["row", "word", "tf"]
        h = hash64(t["word"].tolist())
        pos = np.minimum(np.searchsorted(hs, h), max(len(hs) - 1, 0))
        t["df"] = np.where(hs[pos] == h, dfv[pos], np.int64(0)) if len(hs) else 0
        top = (
            t.sort_values(["row", "tf", "df", "word"],
                          ascending=[True, False, True, True], kind="mergesort")
            .groupby("row", as_index=False)
            .head(1)
        )
        return pa.table(
            {
                id_col: pa.array(ids[top["row"].to_numpy()], pa.int64()),
                "keyword": pa.array(top["word"].tolist(), pa.string()),
                "tf": pa.array(top["tf"].to_numpy(np.int64), pa.int64()),
                "df": pa.array(top["df"].to_numpy(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")
