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
