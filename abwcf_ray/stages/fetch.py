"""Fetch simulation (SURVEY.md §2 A2).

The reference fetches one URL at a time over HTTP (Fetcher.scala:74-188).
In the sandbox the "web" is the pages corpus; fetching a wave is a
**broadcast semi-join**: the wave's (url_hash, depth) pairs — politeness-
bounded, a few MB — are ``ray.put`` once, and the corpus is scanned in
parallel with a vectorized ``searchsorted`` membership test per batch. No
shuffle, no repartition: every task reads its corpus slice and keeps only
the wave's pages (the scan is the stand-in for network IO).

Trade-off vs a bucketed hash join: both read every corpus bucket when the
wave's urls spread across all buckets (they do — hash-distributed); the
scan-filter additionally avoids the sort exchange entirely. At 10^10-URL
scale with LOW per-wave selectivity, sort corpus files by url_hash within
buckets and push a row-group range filter — the broadcast side stays the
same.

Missing urls (404s in FIXTURES.md §1) simply don't match; the driver
accounts them from ``n_selected - matched`` (every selected page ends
Processed regardless — FetchResultConsumer.scala:29-50).

The legacy bucketed-join path (`make_fetch_group_fn`) is kept for corpora
partitioned by other engines.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray

from abwcf_ray.functions.hashing import hash64

FETCH_COLUMNS = ["url", "status", "content_type", "location", "x_robots_tag", "html"]

# per-worker cache: sel_ref -> (sorted url hashes, depths aligned to them)
_SEL_CACHE: dict = {}


def _selection(sel_ref):
    s = _SEL_CACHE.get(sel_ref)
    if s is None:
        if len(_SEL_CACHE) >= 4:
            _SEL_CACHE.pop(next(iter(_SEL_CACHE)))
        s = ray.get(sel_ref)
        _SEL_CACHE[sel_ref] = s
    return s


def make_selection_ref(urls, depths) -> "ray.ObjectRef":
    """Broadcast payload for the wave's fetch set: url hashes sorted for
    searchsorted lookup, with depths aligned."""
    h = hash64(list(urls))
    order = np.argsort(h)
    return ray.put((h[order], np.asarray(depths, dtype=np.int32)[order]))


def make_fetch_scan(sel_ref):
    """Corpus batch -> the wave's fetched rows (url, depth, status,
    content_type, location, x_robots_tag, html)."""

    def fetch_scan(batch: pa.Table) -> pa.Table:
        hashes, depths = _selection(sel_ref)
        h = hash64(batch.column("url"))
        pos = np.searchsorted(hashes, h)
        pos_c = np.minimum(pos, len(hashes) - 1) if len(hashes) else pos
        hit = (
            (pos < len(hashes)) & (hashes[pos_c] == h)
            if len(hashes)
            else np.zeros(len(h), dtype=bool)
        )
        sub = batch.filter(pa.array(hit))
        depth = depths[pos_c[hit]] if len(hashes) else np.array([], dtype=np.int32)
        return pa.table(
            {
                "url": sub.column("url"),
                "depth": pa.array(depth, pa.int32()),
                "status": sub.column("status").cast(pa.int32()),
                "content_type": sub.column("content_type"),
                "location": sub.column("location"),
                "x_robots_tag": sub.column("x_robots_tag"),
                "html": sub.column("html"),
            }
        )

    return fetch_scan


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
