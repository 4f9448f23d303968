"""Fetch simulation (SURVEY.md §2 A2).

The reference fetches one URL at a time over HTTP (Fetcher.scala:74-188).
In the sandbox the "web" is the bucketed pages corpus: fetching a wave is a
partitioned hash join of the wave's URLs against the corpus by url —
each fetch task reads ONLY its bucket's parquet slice
(``pages/bucket=N/``), the stand-in for network IO. At 10^10-URL scale this
is the layout that keeps the join local: both sides are partitioned by
``hash64(url) % num_buckets`` and no all-to-all of page bodies ever happens.

Missing urls -> 404 (FIXTURES.md §1). Response classification downstream is
in stages/transform.make_process_fetched_stage.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from abwcf_ray.functions.hashing import hash64

FETCH_COLUMNS = ["url", "status", "content_type", "location", "x_robots_tag", "html"]


def add_bucket_column(batch: pa.Table, num_buckets: int) -> pa.Table:
    b = hash64(batch.column("url").to_pylist()) % np.uint64(num_buckets)
    return batch.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))


def make_fetch_group_fn(pages_dir: str):
    """``groupby("bucket").map_groups`` fn: join one bucket's wave urls
    against that bucket's corpus slice (left join; miss -> 404)."""

    def fetch_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_fetched()
        bucket = group.column("bucket")[0].as_py()
        bucket_dir = Path(pages_dir) / f"bucket={int(bucket)}"
        corpus = pads.dataset(str(bucket_dir)).to_table(columns=FETCH_COLUMNS)
        left = group.drop_columns(["bucket"])
        joined = left.join(corpus, keys="url", join_type="left outer")
        # left-join misses leave status null -> 404 with no body
        status = joined.column("status").fill_null(404)
        joined = joined.set_column(
            joined.schema.get_field_index("status"), "status", status.cast(pa.int32())
        )
        return joined

    return fetch_group


def _empty_fetched() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "depth": pa.array([], pa.int32()),
            "priority": pa.array([], pa.int64()),
            "status": pa.array([], pa.int32()),
            "content_type": pa.array([], pa.string()),
            "location": pa.array([], pa.string()),
            "x_robots_tag": pa.array([], pa.string()),
            "html": pa.array([], pa.binary()),
        }
    )
