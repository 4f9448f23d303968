"""End-to-end golden tests: the Ray Data wave pipeline must match the
single-process oracle (pipelines/oracle.py) exactly — fetch order, final
frontier, extracted text, seen set — and a killed run must resume to the
identical final state (SURVEY.md §5 step 3)."""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
import pyarrow.dataset as pads
import pytest

from abwcf_ray.config import CrawlConfig
from abwcf_ray.pipelines.oracle import run_oracle
from abwcf_ray.sources.corpus import generate_corpus

N_PAGES = 600
CFG = CrawlConfig(max_waves=5, wave_duration_s=10.0, seen_shards=4, corpus_buckets=8,
                  max_crawl_depth=6)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return generate_corpus(tmp_path_factory.mktemp("c"), n_pages=N_PAGES, seed=42,
                           num_buckets=8)


@pytest.fixture(scope="module")
def oracle(corpus):
    return run_oracle(CFG, corpus)


@pytest.fixture(scope="module")
def ray_run(ray_session, corpus, tmp_path_factory):
    from abwcf_ray.pipelines.crawl import run_crawl

    out = tmp_path_factory.mktemp("crawl")
    summary = run_crawl(CFG, corpus, out, log=lambda *_: None)
    return out, summary


def _final_frontier(out: Path, summary) -> pd.DataFrame:
    from abwcf_ray.pipelines.crawl import frontier_dataset

    df = frontier_dataset(summary.last_wave_dir).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def test_fetch_order_matches_oracle(ray_run, oracle):
    out, summary = ray_run
    for wave, expected in enumerate(oracle.order):
        sel = pads.dataset(str(out / f"wave_{wave:04d}" / "selected")).to_table().to_pandas()
        sel = sel.sort_values("global_rank")
        got = list(zip(sel["host"], sel["rank_in_host"], sel["url"]))
        assert got == expected, f"wave {wave} fetch order diverges"


def test_final_frontier_matches_oracle(ray_run, oracle):
    out, summary = ray_run
    got = _final_frontier(out, summary)
    exp = (
        pd.DataFrame(
            [(u, s, d, p) for u, (s, d, p) in oracle.frontier.items()],
            columns=["url", "status", "depth", "priority"],
        )
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["url", "status", "depth", "priority"]].astype({"depth": "int64"}),
        exp.astype({"depth": "int64"}),
    )


def test_extracted_text_byte_identical(ray_run, oracle, corpus):
    out, summary = ray_run
    frames = []
    for d in sorted(out.glob("wave_*/processed")):
        if any(d.glob("*.parquet")):
            t = pads.dataset(str(d)).to_table(columns=["url", "text", "is_html"])
            frames.append(
                t.filter(t.column("is_html")).select(["url", "text"]).to_pandas()
            )
    got = pd.concat(frames).sort_values("url").reset_index(drop=True)
    exp = (
        pd.DataFrame(sorted(oracle.extracted.items()), columns=["url", "text"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # and against the corpus ground truth (the north-rule per-row invariant)
    pages = pads.dataset(corpus.pages_dir).to_table(
        columns=["url", "text"]
    ).to_pandas().set_index("url")
    for url, text in oracle.extracted.items():
        assert pages.loc[url, "text"] == text


def test_seen_set_matches_oracle(ray_run, oracle):
    out, summary = ray_run
    assert summary.seen_size == len(oracle.seen)
    got = _final_frontier(out, summary)
    assert set(got["url"]) == oracle.seen  # frontier urls == seen set


def test_statuses_cover_disallowed(ray_run):
    out, summary = ray_run
    got = _final_frontier(out, summary)
    counts = got["status"].value_counts()
    assert counts.get("Processed", 0) > 0
    assert counts.get("Disallowed", 0) > 0  # 503-robots hosts fail closed


def test_resume_equivalence(ray_session, corpus, tmp_path_factory, oracle):
    """Kill after wave 1, resume, final state must equal the straight run."""
    from abwcf_ray.pipelines.crawl import run_crawl

    out = tmp_path_factory.mktemp("resume")
    cfg_short = CrawlConfig(**{**CFG.__dict__, "max_waves": 2})
    run_crawl(cfg_short, corpus, out, log=lambda *_: None)
    # wave_0001 exists and is completed; resume to the end
    summary = run_crawl(CFG, corpus, out, resume=True, log=lambda *_: None)
    got = _final_frontier(out, summary)
    exp = (
        pd.DataFrame(
            [(u, s, d, p) for u, (s, d, p) in oracle.frontier.items()],
            columns=["url", "status", "depth", "priority"],
        )
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["url", "status", "depth", "priority"]].astype({"depth": "int64"}),
        exp.reset_index(drop=True).astype({"depth": "int64"}),
    )


def test_resume_after_midwave_crash(ray_session, corpus, tmp_path_factory, oracle):
    """A wave dir without a completed manifest (crash mid-wave) is wiped and
    re-run; the final state still matches the oracle."""
    import shutil

    from abwcf_ray.pipelines.crawl import run_crawl

    out = tmp_path_factory.mktemp("crash")
    cfg_short = CrawlConfig(**{**CFG.__dict__, "max_waves": 2})
    run_crawl(cfg_short, corpus, out, log=lambda *_: None)
    # simulate a crash during wave 1: manifest gone, partial files remain
    (out / "wave_0001" / "manifest.json").unlink()
    shutil.rmtree(out / "wave_0001" / "selected")
    summary = run_crawl(CFG, corpus, out, resume=True, log=lambda *_: None)
    got = _final_frontier(out, summary)
    assert len(got) == len(oracle.frontier)
    assert set(got["url"]) == oracle.seen


def test_manifest_lineage(ray_run):
    out, summary = ray_run
    m = json.loads((out / "wave_0000" / "manifest.json").read_text())
    assert m["completed"] and m["wave"] == 0
    assert m["files"]["frontier_delta"], "per-partition delta lineage missing"
    assert all("rows" in f for f in m["files"]["frontier_delta"])
    # n_new comes from the claim tasks' returned counts; the delta parts
    # they tee'd to disk must carry exactly those rows (footer cross-check)
    assert m["n_new"] == sum(f["rows"] for f in m["files"]["frontier_delta"])
    chain = m["frontier_chain"]
    assert chain["base"] and "wave_0000/delta" in chain["deltas"]
    assert "wave_0000/flips.parquet" in chain["flips"]


def test_frontier_compaction_matches_oracle(ray_session, corpus, tmp_path_factory, oracle):
    """With aggressive compaction (every 2 waves) the folded frontier must
    equal the delta-chain result and the oracle exactly."""
    from abwcf_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(**{**CFG.__dict__, "frontier_compact_every": 2})
    out = tmp_path_factory.mktemp("compact")
    summary = run_crawl(cfg, corpus, out, log=lambda *_: None)
    # at least one mid-run compaction actually happened (a non-terminal wave
    # carries a materialized frontier)
    mats = [
        d for d in sorted(out.glob("wave_*/frontier"))
        if d.parent.name != f"wave_{summary.waves - 1:04d}"
    ]
    assert mats, "expected a mid-run compaction at frontier_compact_every=2"
    got = _final_frontier(out, summary)
    exp = (
        pd.DataFrame(
            [(u, s, d, p) for u, (s, d, p) in oracle.frontier.items()],
            columns=["url", "status", "depth", "priority"],
        )
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["url", "status", "depth", "priority"]].astype({"depth": "int64"}),
        exp.astype({"depth": "int64"}),
    )


def test_frontier_dataset_mid_run(ray_run, oracle):
    """frontier_dataset on a NON-compacted wave reconstructs the logical
    frontier (base + deltas + flips) without any materialized frontier/."""
    from abwcf_ray.pipelines.crawl import frontier_dataset

    out, summary = ray_run
    m0 = json.loads((out / "wave_0000" / "manifest.json").read_text())
    df = frontier_dataset(out / "wave_0000").to_pandas()
    assert len(df) == m0["n_frontier"]
    # every selected url of wave 0 shows as Processed in the logical view
    sel = pads.dataset(str(out / "wave_0000" / "selected")).to_table().to_pandas()
    by_url = df.set_index("url")["status"]
    assert (by_url.loc[sel["url"]] == "Processed").all()


def test_max_content_length_cap(ray_session, corpus, tmp_path_factory):
    """Body cap (Fetcher.scala:168-170, reference.conf:132): oversize pages
    end Processed but are consumed-not-parsed — no text, no links — and the
    wave manifest histograms the class; the oracle agrees on the full crawl
    outcome under the cap."""
    from abwcf_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(**{**CFG.__dict__, "max_content_length": 1200})
    out = tmp_path_factory.mktemp("cap")
    summary = run_crawl(cfg, corpus, out, log=lambda *_: None)
    o = run_oracle(cfg, corpus)
    got = _final_frontier(out, summary)
    exp = (
        pd.DataFrame(
            [(u, s, d, p) for u, (s, d, p) in o.frontier.items()],
            columns=["url", "status", "depth", "priority"],
        )
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["url", "status", "depth", "priority"]].astype({"depth": "int64"}),
        exp.astype({"depth": "int64"}),
    )
    # the cap actually triggered, shows in the manifest histogram, and no
    # capped page produced text or links
    n_exceeded = 0
    for d in sorted(out.glob("wave_*")):
        mf = d / "manifest.json"
        if mf.exists():
            hist = json.loads(mf.read_text()).get("fetch_status", {})
            n_exceeded += hist.get("length_limit_exceeded", 0)
    assert n_exceeded > 0, "fixture corpus has pages over the 1200-byte cap"
    for d in sorted(out.glob("wave_*/processed")):
        if any(d.glob("*.parquet")):
            t = pads.dataset(str(d)).to_table(
                columns=["length_exceeded", "is_html", "text", "links"]
            ).to_pandas()
            capped = t[t["length_exceeded"]]
            assert not capped["is_html"].any()
            assert capped["text"].isna().all()
            assert (capped["links"].map(len) == 0).all()


def test_robots_ttl_expiry_matches_oracle(ray_session, corpus, tmp_path_factory):
    """Short robots TTLs force re-fetch + expired-rules-reuse mid-crawl
    (HostManager.scala:142-162); pipeline must still match the oracle."""
    from abwcf_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(
        max_waves=6,
        wave_duration_s=10.0,
        seen_shards=4,
        corpus_buckets=8,
        max_crawl_depth=6,
        valid_rules_lifetime_s=25,       # expires every ~3 waves
        unavailable_rules_lifetime_s=25,
        unreachable_rules_lifetime_s=15,
    )
    out = tmp_path_factory.mktemp("ttl")
    summary = run_crawl(cfg, corpus, out, log=lambda *_: None)
    o = run_oracle(cfg, corpus)
    got = _final_frontier(out, summary)
    exp = (
        pd.DataFrame(
            [(u, s, d, p) for u, (s, d, p) in o.frontier.items()],
            columns=["url", "status", "depth", "priority"],
        )
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["url", "status", "depth", "priority"]].astype({"depth": "int64"}),
        exp.astype({"depth": "int64"}),
    )
    # re-fetches actually happened after wave 0
    import json as _json

    refetches = sum(
        _json.loads((d / "manifest.json").read_text()).get("n_robots_fetched", 0)
        for d in sorted(out.glob("wave_*"))[1:]
        if (d / "manifest.json").exists()
    )
    assert refetches > 0


def test_bucketed_hosts_wave_matches_oracle(ray_session, corpus, tmp_path_factory, oracle):
    """Full crawl with the robots filters forced onto the 10^8-host bucketed
    join path (hosts_broadcast_max=0): final frontier must equal the oracle,
    i.e. the bucketed join is semantically invisible."""
    from abwcf_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(
        **{**CFG.__dict__, "hosts_broadcast_max": 0, "hosts_bucket_bits": 3}
    )
    out = tmp_path_factory.mktemp("bucketed")
    summary = run_crawl(cfg, corpus, out, log=lambda *_: None)
    got = _final_frontier(out, summary)
    exp = (
        pd.DataFrame(
            [(u, s, d, p) for u, (s, d, p) in oracle.frontier.items()],
            columns=["url", "status", "depth", "priority"],
        )
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["url", "status", "depth", "priority"]].astype({"depth": "int64"}),
        exp.astype({"depth": "int64"}),
    )


def test_compaction_status_split_prunes_eligible_scan(ray_session, corpus, tmp_path_factory):
    """Compaction writes the frontier status-split (discovered/ + settled/)
    and the next wave's eligible scan reads ONLY the discovered split +
    deltas — O(Discovered), not O(frontier), on a mature crawl."""
    from abwcf_ray.pipelines.crawl import _FrontierChain, _parquet_rows, run_crawl

    cfg = CrawlConfig(**{**CFG.__dict__, "frontier_compact_every": 2})
    out = tmp_path_factory.mktemp("split")
    run_crawl(cfg, corpus, out, log=lambda *_: None)
    mats = [d for d in sorted(out.glob("wave_*/frontier")) if (d / "settled").exists()]
    assert mats, "no status-split compaction found"
    base = mats[0]
    assert _parquet_rows(base / "settled") > 0  # fetched pages became settled
    chain = _FrontierChain(out, base)
    elig = set(chain.eligible_sources())
    allp = set(chain.sources())
    assert elig < allp  # strict subset: settled parts excluded
    assert all("settled" not in p for p in elig)
    # the split is lossless: discovered + settled == full frontier rows
    assert _parquet_rows(base) == _parquet_rows(base / "discovered") + _parquet_rows(
        base / "settled"
    )


def test_resume_from_status_split_base(ray_session, corpus, tmp_path_factory, oracle):
    """Kill AFTER a mid-run compaction (status-split base) and resume: the
    chain must rebuild from the split frontier and finish identically."""
    from abwcf_ray.pipelines.crawl import run_crawl

    out = tmp_path_factory.mktemp("resume_split")
    cfg_short = CrawlConfig(
        **{**CFG.__dict__, "max_waves": 3, "frontier_compact_every": 2}
    )
    run_crawl(cfg_short, corpus, out, log=lambda *_: None)
    assert any(
        (d / "settled").exists() for d in out.glob("wave_*/frontier")
    ), "fixture must compact before the kill for this test to bite"
    cfg_full = CrawlConfig(**{**CFG.__dict__, "frontier_compact_every": 2})
    summary = run_crawl(cfg_full, corpus, out, resume=True, log=lambda *_: None)
    got = _final_frontier(out, summary)
    exp = (
        pd.DataFrame(
            [(u, s, d, p) for u, (s, d, p) in oracle.frontier.items()],
            columns=["url", "status", "depth", "priority"],
        )
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["url", "status", "depth", "priority"]].astype({"depth": "int64"}),
        exp.astype({"depth": "int64"}),
    )


def test_distributed_rank_wave_matches_oracle(ray_session, corpus, oracle, tmp_path_factory):
    """Forcing the distributed selected-set ranking (rank_distributed_min=0
    -> every wave takes the Ray-sort rank_selected_ds path) must reproduce
    the oracle fetch order and final frontier exactly — threshold parity
    for the huge-wave path."""
    import dataclasses

    from abwcf_ray.pipelines.crawl import run_crawl

    cfg = dataclasses.replace(CFG, rank_distributed_min=0)
    out = tmp_path_factory.mktemp("crawl_distrank")
    summary = run_crawl(cfg, corpus, out, log=lambda *_: None)
    for wave, expected in enumerate(oracle.order):
        sel = pads.dataset(str(out / f"wave_{wave:04d}" / "selected")).to_table().to_pandas()
        sel = sel.sort_values("global_rank")
        got = list(zip(sel["host"], sel["rank_in_host"], sel["url"]))
        assert got == expected, f"wave {wave} fetch order diverges (distributed rank)"
    got_f = _final_frontier(out, summary)
    assert len(got_f) == len(oracle.frontier)


def test_flips_size_triggers_compaction(ray_session, corpus, oracle, tmp_path_factory):
    """The broadcast flips array is formally bounded: with the delta-count
    trigger disabled (huge frontier_compact_every) and a tiny
    frontier_compact_max_flips, compaction must fire from flips pressure
    alone — the chain's cumulative flips never exceed the cap plus one
    wave's politeness-bounded additions — and the crawl still matches the
    oracle fetch order."""
    import dataclasses
    import json as _json

    from abwcf_ray.pipelines.crawl import run_crawl

    cfg = dataclasses.replace(
        CFG, frontier_compact_every=10_000, frontier_compact_max_flips=50
    )
    out = tmp_path_factory.mktemp("crawl_flipscap")
    summary = run_crawl(cfg, corpus, out, log=lambda *_: None)
    compactions = 0
    max_flips_seen = 0
    for wdir in sorted(out.glob("wave_*")):
        m = _json.loads((wdir / "manifest.json").read_text())
        entry = m.get("frontier_chain", {})
        if "frontier_compact" in m.get("step_times", {}):
            compactions += 1
        # chain flips recorded in the manifest = what the next wave broadcasts
        n_flips = 0
        for rel in entry.get("flips", []):
            n_flips += pads.dataset(str(out / rel)).count_rows()
        max_flips_seen = max(max_flips_seen, n_flips)
    assert compactions >= 1, "flips-size trigger never fired"
    # bounded: cap + one wave's additions (politeness-bounded; here <= ~120/wave)
    assert max_flips_seen <= 50 + 200, max_flips_seen
    for wave, expected in enumerate(oracle.order):
        sel = pads.dataset(str(out / f"wave_{wave:04d}" / "selected")).to_table().to_pandas()
        sel = sel.sort_values("global_rank")
        got = list(zip(sel["host"], sel["rank_in_host"], sel["url"]))
        assert got == expected, f"wave {wave} fetch order diverges (flips-cap run)"


def test_bandwidth_budget_caps_fetchers(ray_session, corpus, oracle, tmp_path_factory):
    """E2 (reference.conf:137,144 / FetcherManager.scala:66): a bandwidth
    budget caps concurrent fetchers at total // min-per-fetcher. The cap
    is recorded in the wave manifest and the crawl output is IDENTICAL to
    the uncapped run (parallelism-only knob)."""
    import dataclasses
    import json as _json

    from abwcf_ray.pipelines.crawl import run_crawl

    cfg = dataclasses.replace(
        CFG,
        total_bandwidth_budget_bps=1_000_000,  # 1 MB/s / 200 kB/s -> 5 fetchers
        min_bandwidth_per_fetcher_bps=200_000,
    )
    out = tmp_path_factory.mktemp("crawl_bw")
    summary = run_crawl(cfg, corpus, out, log=lambda *_: None)
    m0 = _json.loads((out / "wave_0000" / "manifest.json").read_text())
    assert m0["max_fetchers"] == 5
    for wave, expected in enumerate(oracle.order):
        sel = pads.dataset(str(out / f"wave_{wave:04d}" / "selected")).to_table().to_pandas()
        sel = sel.sort_values("global_rank")
        got = list(zip(sel["host"], sel["rank_in_host"], sel["url"]))
        assert got == expected, f"wave {wave} fetch order diverges (bandwidth cap)"
    got_f = _final_frontier(out, summary)
    assert len(got_f) == len(oracle.frontier)


def test_cuckoo_backend_matches_oracle(ray_session, corpus, oracle, tmp_path_factory):
    """seen_backend='cuckoo' (the north star's sharded cuckoo-filter URL-seen
    set, state/cuckoo.py): same fetch order, frontier, and seen size as the
    exact backend / single-process oracle. At fixture scale a well-sized
    filter produces zero false positives, and the run is fully deterministic
    (no RNG anywhere in the filter), so this equivalence is exact."""
    import dataclasses

    from abwcf_ray.pipelines.crawl import run_crawl

    cfg = dataclasses.replace(CFG, seen_backend="cuckoo", seen_cuckoo_capacity=100_000)
    out = tmp_path_factory.mktemp("crawl_cuckoo")
    summary = run_crawl(cfg, corpus, out, log=lambda *_: None)
    for wave, expected in enumerate(oracle.order):
        sel = pads.dataset(str(out / f"wave_{wave:04d}" / "selected")).to_table().to_pandas()
        sel = sel.sort_values("global_rank")
        got = list(zip(sel["host"], sel["rank_in_host"], sel["url"]))
        assert got == expected, f"wave {wave} fetch order diverges (cuckoo seen)"
    got_f = _final_frontier(out, summary)
    assert len(got_f) == len(oracle.frontier)
    assert summary.seen_size == len(oracle.seen)
    assert set(got_f["url"]) == oracle.seen


def test_cuckoo_backend_resume_equivalence(ray_session, corpus, oracle, tmp_path_factory):
    """Resume across the cuckoo fold boundary: the checkpoint folds the
    current wave into the filter, and the resumed run (which restarts at the
    NEXT wave) must still match the oracle exactly."""
    import dataclasses

    from abwcf_ray.pipelines.crawl import run_crawl

    out = tmp_path_factory.mktemp("resume_cuckoo")
    cfg_short = dataclasses.replace(
        CFG, max_waves=2, seen_backend="cuckoo", seen_cuckoo_capacity=100_000
    )
    run_crawl(cfg_short, corpus, out, log=lambda *_: None)
    cfg_full = dataclasses.replace(
        CFG, seen_backend="cuckoo", seen_cuckoo_capacity=100_000
    )
    summary = run_crawl(cfg_full, corpus, out, resume=True, log=lambda *_: None)
    got = _final_frontier(out, summary)
    exp = (
        pd.DataFrame(
            [(u, s, d, p) for u, (s, d, p) in oracle.frontier.items()],
            columns=["url", "status", "depth", "priority"],
        )
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["url", "status", "depth", "priority"]].astype({"depth": "int64"}),
        exp.astype({"depth": "int64"}),
    )
    assert summary.seen_size == len(oracle.seen)


def test_noop_resume_last_wave_dir_valid(ray_session, corpus, tmp_path_factory):
    """Resuming a run whose final wave already completed must be a no-op
    that still reports a VALID last_wave_dir (regression: summary.waves
    stayed 0 and last_wave_dir pointed at wave_-001)."""
    from pathlib import Path

    from abwcf_ray.pipelines.crawl import frontier_dataset, run_crawl

    out = tmp_path_factory.mktemp("noop_resume")
    cfg = CrawlConfig(**{**CFG.__dict__, "max_waves": 2})
    first = run_crawl(cfg, corpus, out, log=lambda *_: None)
    again = run_crawl(cfg, corpus, out, resume=True, log=lambda *_: None)
    assert again.waves == first.waves
    assert Path(again.last_wave_dir).name != "wave_-001"
    assert (Path(again.last_wave_dir) / "manifest.json").exists()
    assert again.total_fetched == first.total_fetched
    a = frontier_dataset(again.last_wave_dir).to_pandas().sort_values("url")
    b = frontier_dataset(first.last_wave_dir).to_pandas().sort_values("url")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_resume_rejects_shard_count_change(ray_session, corpus, tmp_path_factory):
    """Restoring the seen set into a different shard count must refuse
    loudly (shard files are partitioned by h % num_shards — a different
    count silently mis-routes probes)."""
    import pytest as _pytest

    from abwcf_ray.pipelines.crawl import run_crawl

    out = tmp_path_factory.mktemp("shard_change")
    cfg2 = CrawlConfig(**{**CFG.__dict__, "max_waves": 2})
    run_crawl(cfg2, corpus, out, log=lambda *_: None)
    bad = CrawlConfig(**{**CFG.__dict__, "max_waves": 3, "seen_shards": 2})
    with _pytest.raises(RuntimeError, match="shards"):
        run_crawl(bad, corpus, out, resume=True, log=lambda *_: None)
