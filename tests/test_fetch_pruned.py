"""Pruned fetch path: the hash-sorted corpus layout + row-group planner
must read O(selected) row groups, not O(corpus), and return exactly the
selected pages (SURVEY.md §2 A2 scale path; VERDICT round-1 item 1)."""

from __future__ import annotations

import numpy as np
import pytest

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    return generate_corpus(tmp_path_factory.mktemp("pc"), n_pages=30_000, seed=11)


def test_planner_prunes_row_groups(corpus):
    from abwcf_ray.stages.fetch import _hashed_index, plan_pruned_fetch

    paths, file_ids, rg_ids, mins, maxs = _hashed_index(corpus.hashed_dir)
    total_rgs = len(rg_ids)
    assert total_rgs >= 10, "fixture corpus should span many row groups"

    import pyarrow.dataset as pads

    urls = (
        pads.dataset(corpus.pages_dir)
        .to_table(columns=["url"])
        .column("url")
        .to_pylist()[::6000]  # 5 spread-out pages
    )
    sel = np.sort(hash64(urls))
    items = plan_pruned_fetch(corpus.hashed_dir, sel)
    n_rgs = sum(len(i["rgs"]) for i in items)
    assert n_rgs <= len(urls)  # at most one row group per selected hash
    assert n_rgs < total_rgs  # and strictly fewer than a full scan


def test_pruned_reader_returns_exact_selection(ray_session, corpus):
    import ray
    import ray.data as rd

    from abwcf_ray.stages.fetch import make_pruned_fetch_reader, plan_pruned_fetch

    import pyarrow.dataset as pads

    pages = pads.dataset(corpus.pages_dir).to_table(columns=["url", "html"])
    urls = pages.column("url").to_pylist()[100:400:7]
    h = hash64(urls)
    order = np.argsort(h)
    depths = np.arange(len(urls), dtype=np.int32)
    ref = ray.put((h[order], depths[order]))

    items = plan_pruned_fetch(corpus.hashed_dir, h[order])
    out = (
        rd.from_items(items, override_num_blocks=len(items))
        .map_batches(make_pruned_fetch_reader(ref), batch_format="pyarrow")
        .to_pandas()
    )
    assert set(out["url"]) == set(urls)
    # depths align to their urls
    by_url = dict(zip(out["url"], out["depth"]))
    for u, d in zip(urls, depths):
        assert by_url[u] == d
    # bodies are the corpus bodies, byte-identical
    want = dict(zip(pages.column("url").to_pylist(), pages.column("html").to_pylist()))
    got = dict(zip(out["url"], out["html"]))
    assert all(got[u] == want[u] for u in urls if want[u])


def test_pruned_and_scan_paths_agree(ray_session, corpus):
    """The pruned reader and the full-scan semi-join must fetch identical
    row sets."""
    import ray
    import ray.data as rd

    from abwcf_ray.stages.fetch import (
        FETCH_COLUMNS,
        make_fetch_scan,
        make_pruned_fetch_reader,
        plan_pruned_fetch,
    )

    import pyarrow.dataset as pads

    urls = (
        pads.dataset(corpus.pages_dir)
        .to_table(columns=["url"])
        .column("url")
        .to_pylist()[50:2000:13]
    )
    h = hash64(urls)
    order = np.argsort(h)
    ref = ray.put((h[order], np.zeros(len(urls), dtype=np.int32)[order]))

    scan = (
        rd.read_parquet(corpus.pages_dir, columns=FETCH_COLUMNS)
        .map_batches(make_fetch_scan(ref), batch_format="pyarrow")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    items = plan_pruned_fetch(corpus.hashed_dir, h[order])
    pruned = (
        rd.from_items(items, override_num_blocks=len(items))
        .map_batches(make_pruned_fetch_reader(ref), batch_format="pyarrow")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        scan[["url", "depth", "status"]], pruned[["url", "depth", "status"]]
    )


def test_sharded_footer_index_matches_serial(corpus, monkeypatch):
    """Parallel (Ray-task) footer reads must produce the identical planner
    index — and therefore identical plans — as the serial driver path."""
    import abwcf_ray.stages.fetch as F

    F._RG_INDEX_CACHE.clear()
    serial = F._hashed_index(corpus.hashed_dir)

    F._RG_INDEX_CACHE.clear()
    monkeypatch.setattr(F, "_PARALLEL_FOOTER_THRESHOLD", 0)
    parallel = F._hashed_index(corpus.hashed_dir)

    assert serial[0] == parallel[0]  # same paths, same order
    # same (file, rg, min, max) SET — chunked reads interleave row order
    def entry_set(idx):
        return set(zip(idx[1].tolist(), idx[2].tolist(), idx[3].tolist(), idx[4].tolist()))

    assert entry_set(serial) == entry_set(parallel)
    # identical plans for an arbitrary selection
    sel = np.sort(hash64([f"u{i}" for i in range(50)]))
    p1 = F.plan_pruned_fetch(corpus.hashed_dir, sel)
    F._RG_INDEX_CACHE.clear()
    monkeypatch.setattr(F, "_PARALLEL_FOOTER_THRESHOLD", 10**9)
    p2 = F.plan_pruned_fetch(corpus.hashed_dir, sel)
    key = lambda it: (it["path"], tuple(it["rgs"]))
    assert sorted(map(key, p1)) == sorted(map(key, p2))


def test_rg_index_invalidated_on_rebuild(ray_session, corpus):
    """Rebuilding the hashed layout must invalidate the planner cache —
    stale footers would plan reads of files that no longer exist."""
    import abwcf_ray.stages.fetch as F
    from abwcf_ray.sources.corpus import build_hashed_layout

    idx_before = F._hashed_index(corpus.hashed_dir)
    build_hashed_layout(corpus)
    idx_after = F._hashed_index(corpus.hashed_dir)
    # every planned path must exist on disk (the stale-cache failure mode
    # was paths from the pre-rebuild listing)
    from pathlib import Path

    assert all(Path(p).exists() for p in idx_after[0])
    # and the cache holds only the new layout's entry
    assert len([k for k in F._RG_INDEX_CACHE if k[0] == str(corpus.hashed_dir)]) == 1
