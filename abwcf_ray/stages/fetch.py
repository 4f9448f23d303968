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
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
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


def make_fetch_scan(sel_ref, max_content_length: int | None = None):
    """Corpus batch -> the wave's fetched rows (url, depth, status,
    content_type, location, x_robots_tag, html, length_exceeded).

    ``max_content_length`` rebuilds the reference's 1 MB body cap
    (Fetcher.scala:168-170, reference.conf:132): an oversize body is
    DISCARDED at the fetch boundary (the reference aborts the download) and
    the row is flagged ``length_exceeded`` — downstream it is consumed but
    never parsed, and the wave manifest histograms it as
    ``length_limit_exceeded``."""
    import pyarrow.compute as pc

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
        html = sub.column("html")
        if max_content_length is not None:
            exceeded = pc.fill_null(
                pc.greater(pc.binary_length(html), max_content_length), False
            )
            html = pc.if_else(exceeded, pa.scalar(None, pa.binary()), html)
        else:
            exceeded = pa.array(np.zeros(sub.num_rows, dtype=bool))
        return pa.table(
            {
                "url": sub.column("url"),
                "depth": pa.array(depth, pa.int32()),
                "status": sub.column("status").cast(pa.int32()),
                "content_type": sub.column("content_type"),
                "location": sub.column("location"),
                "x_robots_tag": sub.column("x_robots_tag"),
                "html": html,
                "length_exceeded": exceeded,
            }
        )

    return fetch_scan
