"""Scheduler (salted top-k exactness) and seen-set (wave-versioned protocol)
unit tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from abwcf_ray.config import CrawlConfig
from abwcf_ray.stages.schedule import budget_for_delay, rank_selected, select_wave
from abwcf_ray.state.hosts import sched_payload_from_delays


def test_budget_for_delay():
    # k_h = max(1, floor(T/delay)): fetches at t=0, delay, 2·delay, ...
    assert budget_for_delay(1000, 10.0) == 10
    assert budget_for_delay(3000, 10.0) == 3
    assert budget_for_delay(20000, 10.0) == 1  # delay > wave still fetches at t=0
    assert budget_for_delay(0, 10.0) == 10000  # delay 0 bounded by wave ms


def _mk_frontier(n=500, hosts=7, seed=1):
    rng = np.random.default_rng(seed)
    host_ids = rng.integers(0, hosts, n)
    return pa.table(
        {
            "url": pa.array([f"https://h{h}.example/p{i}" for i, h in enumerate(host_ids)]),
            "host": pa.array([f"https://h{h}.example" for h in host_ids]),
            "depth": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            "priority": pa.array(rng.integers(0, 1 << 40, n), pa.int64()),
        }
    )


@pytest.mark.parametrize("override_num_blocks", [1, 8])
def test_partial_topk_is_exact(ray_session, override_num_blocks):
    """Block-local partial top-k must be exact for any partitioning
    (SURVEY.md §4.2 skew row: pruning before the exchange)."""
    import ray
    import ray.data as rd

    t = _mk_frontier()
    delays = {f"https://h{h}.example": 1000 * (1 + h % 3) for h in range(7)}
    cfg = CrawlConfig(wave_duration_s=10.0)
    ds = rd.from_arrow(t).repartition(override_num_blocks)
    got = (
        select_wave(ds, ray.put(sched_payload_from_delays(delays, cfg.wave_duration_s)))
        .sort_values(["priority", "url"], ascending=[False, True])
        .reset_index(drop=True)
    )
    # brute-force expectation
    df = t.to_pandas()
    exp_rows = []
    for host, g in df.groupby("host"):
        k = budget_for_delay(delays[host], 10.0)
        exp_rows.append(
            g.sort_values(["priority", "url"], ascending=[False, True]).head(k)
        )
    exp = (
        pd.concat(exp_rows)
        .sort_values(["priority", "url"], ascending=[False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["url", "host", "priority"]], exp[["url", "host", "priority"]]
    )


def test_select_wave_merge_paths_agree(ray_session):
    """The driver merge (small-wave latency path) and the distributed
    partition merge must produce the identical exact selection."""
    import ray
    import ray.data as rd

    t = _mk_frontier(n=800, hosts=11, seed=7)
    delays = {f"https://h{h}.example": 500 * (1 + h % 4) for h in range(11)}
    cfg = CrawlConfig(wave_duration_s=10.0)
    ds = rd.from_arrow(t).repartition(6)
    key = ["priority", "url"]
    dist = (
        select_wave(ds, ray.put(sched_payload_from_delays(delays, cfg.wave_duration_s)))
        .sort_values(key, ascending=[False, True])
        .reset_index(drop=True)
    )
    driver = (
        select_wave(ds, ray.put(sched_payload_from_delays(delays, cfg.wave_duration_s)), n_eligible_hint=800)
        .sort_values(key, ascending=[False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        dist[["url", "host", "priority"]], driver[["url", "host", "priority"]]
    )


def test_rank_selected_deterministic():
    df = _mk_frontier(50, 3).to_pandas()
    r1, r2 = rank_selected(df.sample(frac=1, random_state=0)), rank_selected(df)
    pd.testing.assert_frame_equal(r1, r2)
    assert (r1.groupby("host")["rank_in_host"].apply(lambda s: (s.values == np.arange(len(s))).all())).all()


def test_seen_set_protocol(ray_session):
    from abwcf_ray.state.seen import SeenSet

    seen = SeenSet(4)
    urls_a = [f"https://x/{i}" for i in range(100)]
    urls_b = [f"https://x/{i}" for i in range(50, 150)]
    seen.add_urls(urls_a, wave=0)
    # wave-1 probe: everything from wave 0 is seen
    mask = seen.contains_urls(urls_b, before_wave=1)
    assert mask[:50].all() and not mask[50:].any()
    # adds at wave 1 are invisible to the wave-1 probe (retry safety)
    seen.add_urls(urls_b, wave=1)
    mask2 = seen.contains_urls(urls_b, before_wave=1)
    assert (mask2 == mask).all()
    # but visible at wave 2; re-add keeps the original wave (setdefault)
    assert seen.contains_urls(urls_b, before_wave=2).all()
    seen.add_urls(urls_a, wave=5)
    assert seen.contains_urls(urls_a, before_wave=1).all()
    assert seen.size() == 150
    seen.shutdown()


def test_seen_set_checkpoint_roundtrip(ray_session, tmp_path):
    from abwcf_ray.state.seen import SeenSet

    seen = SeenSet(3)
    seen.add_urls([f"u{i}" for i in range(500)], wave=2)
    seen.checkpoint(tmp_path / "seen")
    seen.shutdown()

    seen2 = SeenSet(3)
    seen2.restore(tmp_path / "seen")
    assert seen2.size() == 500
    assert seen2.contains_urls(["u0", "u499", "nope"], before_wave=3).tolist() == [
        True,
        True,
        False,
    ]
    assert not seen2.contains_urls(["u0"], before_wave=2)[0]  # wave preserved
    seen2.shutdown()


def test_propose_prededup_semantics(ray_session):
    """B6 (UrlDeduplicator.scala best-effort pre-dedup): within a batch the
    propose stage keeps one row per url hash at MIN depth; across batches of
    the same task it drops rows already passed at equal-or-lower depth but
    NEVER a strictly lower-depth row (which the claim phase must see)."""
    import pyarrow as pa

    from abwcf_ray.state.seen import SeenSet
    from abwcf_ray.stages.transform import _PREDEDUP, make_propose

    seen = SeenSet(num_shards=2)
    _PREDEDUP.clear()
    stage = make_propose(seen, wave=0, run_key="t1", cache_size=1000)

    b1 = pa.table(
        {
            "url": pa.array(["https://a/x", "https://a/x", "https://b/y"]),
            "host": pa.array(["https://a", "https://a", "https://b"]),
            "depth": pa.array([3, 1, 2], pa.int32()),
        }
    )
    out1 = stage(b1)
    # intra-batch: one row per hash, min depth kept
    assert sorted(zip(out1.column("url").to_pylist(), out1.column("depth").to_pylist())) == [
        ("https://a/x", 1),
        ("https://b/y", 2),
    ]

    # equal/higher depth duplicate across batches -> dropped
    b2 = pa.table(
        {
            "url": pa.array(["https://a/x", "https://c/z"]),
            "host": pa.array(["https://a", "https://c"]),
            "depth": pa.array([5, 0], pa.int32()),
        }
    )
    out2 = stage(b2)
    assert out2.column("url").to_pylist() == ["https://c/z"]

    # STRICTLY LOWER depth re-discovery must pass through
    b3 = pa.table(
        {
            "url": pa.array(["https://a/x"]),
            "host": pa.array(["https://a"]),
            "depth": pa.array([0], pa.int32()),
        }
    )
    out3 = stage(b3)
    assert out3.column("url").to_pylist() == ["https://a/x"]

    # a different run key shares nothing (no cross-run contamination)
    stage_other = make_propose(seen, wave=0, run_key="t2", cache_size=1000)
    out_other = stage_other(b2)
    assert sorted(out_other.column("url").to_pylist()) == ["https://a/x", "https://c/z"]

    # the cache is bounded: a tiny cap forces resets; duplicate-only batches
    # still drop (recent pend chunks probe) and NEW urls still pass through
    small = make_propose(seen, wave=0, run_key="t3", cache_size=1)
    for _ in range(3):
        small(b1)
    assert small(b1).num_rows == 0  # pure duplicates of earlier batches
    b4 = pa.table(
        {
            "url": pa.array(["https://new/1"]),
            "host": pa.array(["https://new"]),
            "depth": pa.array([4], pa.int32()),
        }
    )
    assert small(b4).column("url").to_pylist() == ["https://new/1"]
