"""The composed crawl-to-training-corpus pipeline — every stage a user
of this engine runs between "seed list" and "token stream", chained on
ONE streaming pass per phase:

    crawl wave(s)            (pipelines/crawl.run_crawl — fetch, parse,
                              byte-identical extraction, frontier deltas)
      -> processed/ text     (per-wave checkpoint, url + extracted text)
      -> quality filter      (stages/text.add_quality_signals gates)
      -> exact dedup         (stages/dedup.exact_dedup, min-url winner)
      -> sequence packing    (stages/packing.pack_bins, global offsets)
      -> BPE train + encode  (stages/bpe.bpe_train / bpe_encode)

Each phase reuses the production stage verbatim (no special-case code
paths), so this is a composition test of the real operators, not a demo
re-implementation. Output is a one-row summary of corpus mass through
each gate — deterministic for a given corpus, layout-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def build_training_corpus(
    crawl_out_dir,
    *,
    pack_window: int = 128,
    n_merges: int = 4,
    min_words: int = 5,
    max_word_len: float = 40.0,
) -> pd.DataFrame:
    """Run the post-crawl corpus phases over every wave's ``processed/``
    checkpoint under ``crawl_out_dir``. Returns a one-row DataFrame:

        pages_crawled, docs_extracted, docs_kept, docs_unique,
        bins, total_tokens, bpe_tokens, n_merges_trained
    """
    from pathlib import Path

    import ray.data as rd

    from abwcf_ray.functions.hashing import hash64
    from abwcf_ray.stages.bpe import bpe_encode, bpe_train
    from abwcf_ray.stages.dedup import exact_dedup
    from abwcf_ray.stages.packing import pack_bins
    from abwcf_ray.stages.text import add_quality_signals

    out = Path(crawl_out_dir)
    proc_files = sorted(
        str(p) for p in out.glob("wave_*/processed/*.parquet")
    )
    if not proc_files:
        raise FileNotFoundError(f"no wave_*/processed under {crawl_out_dir}")
    pages = rd.read_parquet(proc_files, columns=["url", "is_html", "text"])
    pages_crawled = pages.count()

    def extracted(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b.column("is_html"), True))
        # stable integer doc id: hash64(url) — row-unique, order-free
        ids = hash64(b.column("url")).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": b.column("text"),
            }
        )

    docs = pages.map_batches(extracted, batch_format="pyarrow").materialize()
    docs_extracted = docs.count()

    def quality_gate(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        q = add_quality_signals(b)
        keep = pc.and_(
            pc.greater_equal(q.column("n_words"), min_words),
            pc.less_equal(q.column("mean_word_len"), max_word_len),
        )
        return b.filter(keep)

    kept = docs.map_batches(quality_gate, batch_format="pyarrow").materialize()
    docs_kept = kept.count()

    # exact dedup: min-doc_id representative per distinct text
    winners = exact_dedup(kept, col="text", id_col="doc_id")
    win_ids = np.sort(
        winners.to_pandas()["doc_id"].to_numpy(np.int64)
    )
    import ray

    win_ref = ray.put(win_ids)

    def keep_winners(b: pa.Table) -> pa.Table:
        w = ray.get(win_ref)
        if not len(w):
            return b.slice(0, 0)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(w, ids)
        pos = np.minimum(pos, len(w) - 1)
        return b.filter(pa.array(w[pos] == ids))

    unique = kept.map_batches(keep_winners, batch_format="pyarrow").materialize()
    docs_unique = unique.count()

    packed = pack_bins(unique, window=pack_window).to_pandas()
    bins = int(packed["bin_id"].nunique())
    total_tokens = int(packed["n_in_bin"].sum())

    import pyarrow.compute as pc

    total_chars = int(
        unique.map_batches(
            lambda t: pa.table(
                {
                    "s": pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.utf8_length(t.column("text"))
                                ).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("s")
    )

    merges = bpe_train(unique, n_merges=n_merges)
    encoded = bpe_encode(unique, merges)
    bpe_tokens = int(
        encoded.map_batches(
            lambda t: pa.table(
                {"s": pa.array([int(pa.compute.sum(t.column("n_tokens")).as_py() or 0)], pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("s")
    )

    return pd.DataFrame(
        [
            {
                "pages_crawled": pages_crawled,
                "docs_extracted": docs_extracted,
                "docs_kept": docs_kept,
                "docs_unique": docs_unique,
                "bins": bins,
                "total_tokens": total_tokens,
                "total_chars": total_chars,
                "bpe_tokens": bpe_tokens,
                "n_merges_trained": len(merges),
            }
        ]
    )
