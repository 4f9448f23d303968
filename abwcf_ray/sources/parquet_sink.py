"""Resumable partitioned-Parquet sink.

The 100-TB output contract: a failed run must be re-runnable without
rewriting finished work, so output is one Parquet file per deterministic
partition — never one giant file, never non-deterministic part names
(Ray's ``write_parquet`` names parts by task attempt, so a re-run cannot
tell finished work from unfinished).

Shape: rows route to ``hash(key) % partitions`` (or an explicit int
column), ONE keyed exchange lands each partition whole in one task, and
each task writes ``part-{pid:05d}.parquet`` — to a temp name first, then
an atomic ``os.replace``, so a file EXISTS iff its partition is complete.
A resumed run recomputes the pipeline but each writer task skips its
partition when the final file already exists (O(partition) avoided work;
upstream recompute is Ray's lineage cost, the same trade the crawl
checkpoints make, pipelines/crawl.py:33). Rows are sorted by ``sort_col``
inside each partition so re-written partitions are reproducible.

Cite: the reference's persistence analog is the page-table upsert
(SlickPageRepository.scala) — a database gives it resumability for free;
a Parquet lake needs the partition-manifest discipline above.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from abwcf_ray.functions.hashing import hash64


def write_partitioned_parquet(
    ds,
    out_dir: str | Path,
    *,
    key_col: str,
    partitions: int = 64,
    sort_col: str | None = None,
    compression: str = "zstd",
) -> dict:
    """Write ``ds`` as ``out_dir/part-{pid:05d}.parquet``, one file per
    hash(key_col) partition; partitions whose final file already exists
    are SKIPPED (resume semantics). Returns ``{"written": [pid...],
    "skipped": [pid...]}``."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    sort_by = sort_col or key_col

    def tag(t: pa.Table) -> pa.Table:
        c = t.column(key_col)
        if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
            h = hash64(c)
        else:
            h = c.to_numpy(zero_copy_only=False).astype(np.int64).astype(
                np.uint64
            )
        return t.append_column(
            "_pid", pa.array((h % np.uint64(partitions)).astype(np.int64))
        )

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["_pid"].iloc[0])
        g = g.drop(columns="_pid").sort_values(sort_by, kind="mergesort")
        final = out / f"part-{pid:05d}.parquet"
        if final.exists():
            return pd.DataFrame({"pid": [pid], "written": [False],
                                 "rows": [len(g)]})
        tmp = out / f".part-{pid:05d}.tmp-{os.getpid()}"
        pq.write_table(
            pa.Table.from_pandas(g, preserve_index=False), tmp,
            compression=compression,
        )
        os.replace(tmp, final)  # atomic: file exists iff partition complete
        return pd.DataFrame({"pid": [pid], "written": [True],
                             "rows": [len(g)]})

    res = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_pid")
        .map_groups(write_part, batch_format="pandas")
        .to_pandas()
    )
    return {
        "written": sorted(res.loc[res["written"], "pid"].tolist()),
        "skipped": sorted(res.loc[~res["written"], "pid"].tolist()),
        "rows": int(res["rows"].sum()),
    }
