"""Web-text curation pipeline — the end-to-end training-data story
composed from the engine's stages: quality filter -> exact dedup, the
standard first pass over crawled text before near-dup/LSH passes.

Everything is integer-exact (word counts, ``2*n_alpha >= n_chars`` instead
of a float ratio) so a DuckDB oracle can replicate the pipeline value-for-
value (`__ray_entry__.oracle_sql()['curation']`).

Composition at scale: ``curate`` is one streaming pass (map_batches filter)
feeding exact_dedup's partial-aggregate + native Min/Sum groupby — the same
shuffle-light shape as the standalone dedup. Chain
``minhash_lsh_dedup(curate_kept_ds)`` for the near-dup second pass.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import exact_dedup


def make_quality_filter(
    min_words: int = 5,
    max_words: int = 100_000,
    text_col: str = "text",
):
    """Batch filter: keep documents with ``min_words <= words <= max_words``
    and at least half their characters alphabetic (``2*n_alpha >= n_chars``
    — integer-exact, so SQL oracles agree bit-for-bit). Appends
    ``n_words``."""

    def quality_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("n_words", pa.array([], pa.int64()))
        texts = batch.column(text_col).to_pandas().astype("string").fillna("")
        n_words = texts.str.count(r"\S+").astype("int64")
        n_alpha = texts.str.count(r"[A-Za-zÀ-ÿ]").astype("int64")
        n_chars = texts.str.len().astype("int64")
        keep = (
            (n_words >= min_words)
            & (n_words <= max_words)
            & (2 * n_alpha >= n_chars)
        ).to_numpy(dtype=bool)
        out = batch.append_column("n_words", pa.array(n_words, pa.int64()))
        return out.filter(pa.array(keep))

    return quality_filter


def make_repetition_filter(
    rep_num: int = 1, rep_den: int = 8, text_col: str = "text"
):
    """Batch filter: keep documents whose most frequent word takes at most
    ``rep_num/rep_den`` of all word occurrences (the Gopher boilerplate
    gate, word-granular). Integer cross-multiply (``mx * den <= n * num``)
    — no float boundary for the SQL oracle to disagree on."""

    def repetition_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        texts = batch.column(text_col).to_pandas().astype("string").fillna("")
        words = texts.str.findall(r"\S+")
        n = words.str.len().astype("int64").to_numpy()
        ex = words.explode().dropna()
        if len(ex):
            mx = (
                ex.groupby([ex.index, ex])
                .size()
                .groupby(level=0)
                .max()
                .reindex(texts.index, fill_value=0)
                .to_numpy()
            )
        else:
            mx = n * 0
        return batch.filter(pa.array(mx * rep_den <= n * rep_num))

    return repetition_filter


def curate_full(
    ds,
    bench_texts,
    *,
    min_words: int = 5,
    max_words: int = 100_000,
    rep_num: int = 1,
    rep_den: int = 8,
    decontam_k: int = 13,
    quota: int | dict = 25,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The full curation story in one pipeline: quality filter ->
    repetition filter -> benchmark decontamination -> exact dedup (min-id
    representative per distinct text) -> per-stratum quota sample.
    Returns a Dataset of (id_col, strata_col, dup_count).

    Scale shape: the three filters fuse into ONE streaming map pass (pure
    row filters, no shuffle; decontamination probes a broadcast benchmark
    hash array). The only exchanges are exact_dedup's partial-aggregated
    groupby and the sampler's politeness-bounded sharded merge. The
    representative's stratum rides THROUGH the dedup aggregate as a
    zero-padded ``(id, stratum)`` composite min — Ray's native Min on one
    string column replaces an argmin the aggregate API lacks, so there is
    no second join back to the corpus to recover the stratum."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Min, Sum

    from abwcf_ray.stages.decontam import benchmark_gram_hashes, make_decontaminate_stage
    from abwcf_ray.stages.dedup import add_content_hash
    from abwcf_ray.stages.sample import stratified_sample

    bench_ref = ray.put(benchmark_gram_hashes(list(bench_texts), decontam_k))
    qf = make_quality_filter(min_words, max_words, text_col)
    rf = make_repetition_filter(rep_num, rep_den, text_col)
    decon = make_decontaminate_stage(bench_ref, decontam_k, text_col)

    def filter_pass(batch: pa.Table) -> pa.Table:
        b = decon(rf(qf(batch)))
        b = b.filter(pc.invert(b.column("contaminated")))
        return add_content_hash(b, text_col).select(
            [id_col, strata_col, "content_hash"]
        )

    survivors = ds.map_batches(filter_pass, batch_format="pyarrow")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ml = b[id_col].map("{:020d}".format) + "|" + b[strata_col].astype(str)
        g = (
            b.assign(_ml=ml)
            .groupby("content_hash", as_index=False)
            .agg(_ml=("_ml", "min"), n=("_ml", "size"))
        )
        return g

    from abwcf_ray.stages.dedup import keyed_hash_agg

    reps = keyed_hash_agg(
        survivors.map_batches(partial, batch_format="pandas"),
        lambda b: b.column("content_hash").to_numpy(zero_copy_only=False),
        lambda g: g.groupby("content_hash", as_index=False).agg(
            ml=("_ml", "min"), dup_count=("n", "sum")
        ),
    )

    def split_ml(b: pa.Table) -> pa.Table:
        ml = b.column("ml").to_pandas()
        return pa.table(
            {
                id_col: pa.array(
                    ml.str.slice(0, 20).astype(np.int64).to_numpy(), pa.int64()
                ),
                strata_col: pa.array(ml.str.slice(21).tolist(), pa.string()),
                "dup_count": b.column("dup_count"),
            }
        )

    reps = reps.map_batches(split_ml, batch_format="pyarrow")
    return stratified_sample(reps, quota, strata_col=strata_col, id_col=id_col)


def curate(
    ds,
    *,
    min_words: int = 5,
    max_words: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """documents -> curated representatives: quality-filtered docs, exact-
    deduplicated by content (min id per distinct text wins). Returns a
    Dataset with columns (id_col, dup_count) — dup_count counts the kept
    doc's duplicates WITHIN the quality-filtered set."""
    filtered = ds.map_batches(
        make_quality_filter(min_words, max_words, text_col),
        batch_format="pyarrow",
    )
    deduped = exact_dedup(filtered, col=text_col, id_col=id_col)
    return deduped.drop_columns(["content_hash"])
