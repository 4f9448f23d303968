"""Curation-family microbench at volume: the sf fixtures hold only 5k
documents, so per-op costs there are all fixed overhead. This tiles the
sf0.1 documents table to ``--n-docs`` rows (deterministic: copy c of doc i
gets doc_id = i + c*5000, same text/lang) into a one-time /tmp parquet,
then times each operator over it in one Ray session.

Usage: python tools/bench_curation.py [--n-docs 500000] [--cpus 16]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DOCS = "/root/testdata/sf0.1/documents.parquet"


def build_corpus(n_docs: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(f"/tmp/abwcf_curation_bench_{n_docs}")
    if (out / "_done").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    base = pq.read_table(SF_DOCS, columns=["doc_id", "text", "lang"])
    n_base = base.num_rows
    copies = (n_docs + n_base - 1) // n_base
    part = 0
    written = 0
    for c in range(copies):
        take = min(n_base, n_docs - written)
        t = base.slice(0, take)
        ids = pa.compute.add(t.column("doc_id"), pa.scalar(c * n_base, pa.int64()))
        t = t.set_column(0, "doc_id", ids)
        pq.write_table(t, out / f"part-{part:04d}.parquet")
        written += take
        part += 1
    (out / "_done").touch()
    return str(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    corpus_dir = build_corpus(args.n_docs)

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from abwcf_ray.stages.decontam import decontaminate
    from abwcf_ray.stages.packing import chunk_documents
    from abwcf_ray.stages.sample import (
        replicate_by_weight,
        sample_by_rate,
        stratified_sample,
    )
    from abwcf_ray.stages.text import add_repetition_signals, scrub_pii

    def docs():
        return rd.read_parquet(corpus_dir)

    # benchmark slice for decontam: every 1000th base doc (built untimed)
    bench_texts = (
        rd.read_parquet(SF_DOCS, columns=["doc_id", "text"])
        .to_pandas()
        .query("doc_id % 1000 == 0")["text"]
        .tolist()
    )

    times: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        n = fn()
        times[name] = round(time.perf_counter() - t0, 3)
        rows[name] = int(n)

    timed("sample_rate", lambda: sample_by_rate(docs(), 0.3).count())
    timed(
        "stratified_sample",
        lambda: stratified_sample(docs(), 10_000, strata_col="lang").count(),
    )
    timed(
        "stratified_sample_dist",
        lambda: stratified_sample(
            docs(), 10_000, strata_col="lang", driver_merge_max_rows=0
        ).count(),
    )
    timed(
        "replicate_by_weight",
        lambda: replicate_by_weight(docs(), {"en": 2.5, "de": 0.5}).count(),
    )
    timed(
        "repetition_signals",
        lambda: docs()
        .map_batches(add_repetition_signals, batch_format="pyarrow")
        .count(),
    )
    timed("pii_scrub", lambda: docs().map_batches(scrub_pii, batch_format="pyarrow").count())
    timed("decontaminate", lambda: decontaminate(docs(), bench_texts, k=13).count())
    timed("chunk_docs", lambda: chunk_documents(docs(), 64).count())

    # ExactSubstr at volume: the tiled corpus duplicates every base text
    # ~n_docs/5000 times, so exact mode's drop set (~(tokens-k+1) okeys per
    # duplicated doc) blows past broadcast_max_drops and exercises the
    # doc-co-partitioned reassembly; winnowed mode (w=8) shows the
    # exchange-shrink lever on the same input.
    from abwcf_ray.stages.substr import exact_substring_dedup

    timed(
        "substr_dedup",
        lambda: exact_substring_dedup(docs(), k=16).count(),
    )
    timed(
        "substr_dedup_winnow8",
        lambda: exact_substring_dedup(docs(), k=16, window=8).count(),
    )

    # the keyed-partition aggregate family (keyed_hash_agg): exact_dedup on
    # the tiled corpus has only ~5k distinct hashes; the "_unique" variant
    # salts every text with its doc_id so the merge runs at full 500k-key
    # cardinality — the regime where the native node-keyed groupby was
    # measured 22x slower.
    from abwcf_ray.stages.dedup import exact_dedup
    from abwcf_ray.stages.lm import lm_rarity_score
    from abwcf_ray.stages.paragraphs import paragraph_dedup, remove_boilerplate

    import pyarrow as pa
    import pyarrow.compute as pc

    def salted():
        return docs().map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("text"),
                "text",
                pc.binary_join_element_wise(
                    pc.cast(b.column("text"), pa.string()),
                    pc.cast(b.column("doc_id"), pa.string()),
                    " ",
                ),
            ),
            batch_format="pyarrow",
        )

    timed("exact_dedup", lambda: exact_dedup(docs()).count())
    timed("exact_dedup_unique", lambda: exact_dedup(salted()).count())
    timed("boilerplate", lambda: remove_boilerplate(docs()).count())
    timed("paragraph_dedup", lambda: paragraph_dedup(docs()).count())
    timed("lm_rarity", lambda: lm_rarity_score(docs()).count())

    # round-4 late additions at volume
    from abwcf_ray.stages.bpe import bpe_encode
    from abwcf_ray.stages.packing import pack_bins
    from abwcf_ray.stages.sketch import cms_heavy_hitters

    timed("pack_bins", lambda: pack_bins(docs(), window=2048).count())
    timed(
        "cms_topwords",
        lambda: len(
            cms_heavy_hitters(docs(), threshold=args.n_docs // 10)
        ),
    )
    import pandas as pd

    fixed_merges = pd.DataFrame(
        {"left_id": [ord("t"), 1], "right_id": [ord("h"), ord("e")], "new_id": [1, 2]}
    )
    timed(
        "bpe_encode_2merges",
        lambda: bpe_encode(docs(), fixed_merges).count(),
    )

    n = args.n_docs
    print(
        json.dumps(
            {
                "metric": "curation ops wall time over a tiled documents table",
                "n_docs": n,
                "num_cpus": args.cpus,
                "times_s": times,
                "rows": rows,
                "docs_per_sec": {
                    k: round(n / v, 1) if v else None for k, v in times.items()
                },
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
