"""The crawl wave driver (SURVEY.md §3.4).

Each wave is one Ray Data round over the frontier:

    eligible  = frontier.filter(status == 'Discovered')
    host-prep : unknown/expired hosts -> robots fetch-sim -> hosts table
    strict    : broadcast hosts join (C2, fail-close) + reject side-channel
    select    : shuffle-free partial top-k_h per host (politeness, D1/D2)
    fetch     : broadcast semi-join — wave url-hashes ray.put once, the
                corpus scanned in parallel (A2)
    process   : extract text (A7) + links (B1-B3) in one html pass
    cand'     : explode -> normalize (B4) -> scope (B5) -> lenient (C1)
                -> sharded propose/claim = wave-dedup + seen set (F1)
                -> prioritize (B7)
    frontier' = status updates ∪ new rows -> parquet checkpoint + manifest

The steady-state wave contains NO all-to-all exchange (see stages/schedule,
stages/fetch, state/seen docstrings for each replacement).

Control returns to the driver only at wave boundaries. All cross-wave state
(frontier, hosts, seen shards) is parquet-checkpointed per wave with a
manifest recording per-file row counts — the per-partition lineage that
makes a killed run resumable from the last completed wave
(:func:`run_crawl` with ``resume=True``; the reference's equivalent is the
pages/hosts SQL tables, SURVEY.md §3.3).

The virtual clock is ``now = wave_index * wave_duration`` (SURVEY.md §2 G):
robots TTLs and the politeness window are functions of the wave index, never
wall clock, so runs are reproducible.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from abwcf_ray.config import CrawlConfig
from abwcf_ray.functions.hashing import hash64
from abwcf_ray.sources.corpus import CorpusMeta
from abwcf_ray.stages.fetch import (
    FETCH_COLUMNS,
    make_fetch_scan,
    make_pruned_fetch_reader,
    plan_pruned_fetch,
)
from abwcf_ray.stages.schedule import rank_selected, select_wave
from abwcf_ray.stages.transform import (
    STATUS_DISCOVERED,
    explode_links,
    make_lenient_robots_filter,
    make_normalize_stage,
    make_process_fetched_stage,
    make_prioritize_stage,
    make_propose,
    make_scope_filter_stage,
    make_strict_robots_filter,
    make_update_status,
)
from abwcf_ray.stages.transform import partial_host_counts
from abwcf_ray.state.hosts import HostsState, RobotsFetchSim
from abwcf_ray.state.seen import HashAccumulator, HostSetAccumulator, SeenSet

# Hosts fetched per wave below this threshold are resolved on the driver
# (measured: 20k sim-lookups+parses take ~0.5 s, while spinning the Ray
# actor-pool stage costs ~3 s); above it the robots fetch-sim runs as a
# distributed map_batches stage (the multi-node path).
_DRIVER_ROBOTS_THRESHOLD = 50_000


@dataclass
class CrawlSummary:
    out_dir: str
    waves: int = 0
    total_fetched: int = 0
    final_frontier_rows: int = 0
    seen_size: int = 0
    per_wave: list[dict] = field(default_factory=list)

    @property
    def last_wave_dir(self) -> str:
        return str(Path(self.out_dir) / f"wave_{self.waves - 1:04d}")


def _wave_dir(out_dir: Path, n: int) -> Path:
    return out_dir / f"wave_{n:04d}"


def _file_lineage(directory: Path) -> list[dict]:
    out = []
    for f in sorted(directory.rglob("*.parquet")):
        out.append({"file": str(f.relative_to(directory)), "rows": pq.read_metadata(f).num_rows})
    return out


def _parquet_rows(directory: Path) -> int:
    return sum(pq.read_metadata(f).num_rows for f in directory.rglob("*.parquet"))


def _seed_transform(cfg: CrawlConfig, seeds_chunk: list[str]) -> pa.Table:
    norm = make_normalize_stage(cfg)
    scope = make_scope_filter_stage(cfg)
    t = pa.table(
        {
            "url": pa.array(seeds_chunk, pa.string()),
            "depth": pa.array([0] * len(seeds_chunk), pa.int32()),
        }
    )
    return scope(norm(t))


_seed_chunk = ray.remote(_seed_transform)


def _seed_frontier(cfg: CrawlConfig, seeds: list[str], prioritize) -> pa.Table:
    """Wave-0 seeding (Crawler.scala:156-160): seeds enter at the
    normalizer (bypassing only the best-effort LRU dedup), then scope filter;
    hosts are all unknown so the lenient filter passes everything; PageManager
    dedup keeps the first of duplicate-normalizing seeds. Large seed lists
    (mature-frontier restores) normalize in parallel Ray tasks; chunk order
    is preserved so first-wins dedup stays deterministic."""
    if len(seeds) >= 50_000 and ray.is_initialized():
        n_chunks = 16
        step = (len(seeds) + n_chunks - 1) // n_chunks
        refs = [
            _seed_chunk.remote(cfg, seeds[i : i + step])
            for i in range(0, len(seeds), step)
        ]
        t = pa.concat_tables(ray.get(refs)).combine_chunks()
    else:
        t = _seed_transform(cfg, seeds)
    # first-discovery-wins dedup, deterministic because seeds are ordered
    keep = ~pd.Series(t.column("url").to_pylist()).duplicated()
    t = t.filter(pa.array(keep.to_numpy()))
    t = prioritize(t)
    status = pa.array([STATUS_DISCOVERED] * t.num_rows, pa.string())
    return pa.table(
        {
            "url": t.column("url"),
            "host": t.column("host"),
            "status": status,
            "depth": t.column("depth"),
            "priority": t.column("priority"),
        }
    )


def _host_prep(
    cfg: CrawlConfig,
    hosts_state: HostsState,
    robots_path: str,
    hosts_needed: list[str],
    now_s: float,
) -> int:
    """C3/C4/A3: fetch robots for unknown/expired hosts of this wave."""
    need = hosts_state.missing_or_expired(hosts_needed, now_s)
    if not need:
        return 0
    if len(need) <= _DRIVER_ROBOTS_THRESHOLD:
        sim = getattr(hosts_state, "_sim", None)
        if sim is None:
            sim = hosts_state._sim = RobotsFetchSim(robots_path, cfg)
        batch = pa.table(
            {
                "host": pa.array(need, pa.string()),
                "now_s": pa.array([now_s] * len(need), pa.float64()),
            }
        )
        hosts_state.merge_fetched(sim(batch))
    else:
        ds = rd.from_items([{"host": h, "now_s": now_s} for h in need])
        fetched = ds.map_batches(
            RobotsFetchSim,
            fn_constructor_args=(robots_path, cfg),
            batch_format="pyarrow",
            batch_size=256,
            # the reference's gate of 5 concurrent robots fetches is PER NODE
            # (reference.conf:245); an elastic pool is the multi-node analog
            concurrency=(2, 16),
        )
        hosts_state.merge_fetched(_collect_arrow(fetched))
    return len(need)


@ray.remote
def _claim_block(
    block: pa.Table, idx: int, seen_set, wave: int, host_accum, cfg: CrawlConfig
) -> pa.Table:
    """Claim + prioritize + frontier-columns for one candidate block."""
    from abwcf_ray.stages.transform import FRONTIER_SCHEMA, claim_batch, make_prioritize_stage

    if block.num_rows == 0 or "url" not in block.schema.names:
        return FRONTIER_SCHEMA.empty_table()
    out = claim_batch(block, seen_set, wave, idx, host_accum)
    out = make_prioritize_stage(cfg)(out)
    status = pa.array([STATUS_DISCOVERED] * out.num_rows, pa.string())
    return out.append_column("status", status).select(
        ["url", "host", "status", "depth", "priority"]
    )


def _collect_arrow(ds: "rd.Dataset") -> pa.Table:
    """Materialize a SMALL dataset to one arrow table on the driver."""
    tables = [ray.get(ref) for ref in ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="default")


def run_crawl(
    cfg: CrawlConfig,
    corpus: CorpusMeta,
    out_dir: str | Path,
    *,
    seeds: list[str] | None = None,
    resume: bool = False,
    log=print,
) -> CrawlSummary:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    prioritize = make_prioritize_stage(cfg)
    seen = SeenSet(cfg.seen_shards)
    hosts_state = HostsState(cfg)
    summary = CrawlSummary(out_dir=str(out))
    total_fetched = 0
    start_wave = 0

    if resume:
        completed = sorted(
            (
                d
                for d in out.glob("wave_*")
                if (d / "manifest.json").exists()
                and json.loads((d / "manifest.json").read_text()).get("completed")
            ),
            # numeric sort: lexicographic breaks at wave 10000 ('wave_9999' >
            # 'wave_10000')
            key=lambda d: int(d.name.split("_")[1]),
        )
        if completed:
            last = completed[-1]
            manifest = json.loads((last / "manifest.json").read_text())
            start_wave = manifest["wave"] + 1
            total_fetched = manifest["total_fetched"]
            seen.restore(last / "seen")
            hosts_state.restore(last / "hosts.parquet")
            summary.per_wave = [
                json.loads((d / "manifest.json").read_text()) for d in completed
            ]
            prev_frontier = last / "frontier"
            log(f"[crawl] resuming after wave {manifest['wave']}")
        else:
            resume = False

    if not resume:
        # fresh run: wipe any previous run's checkpoints — Ray's
        # write_parquet appends part files, so stale wave dirs would merge
        # into the new run's frontier reads
        import shutil

        for d in list(out.glob("wave_*")) + [out / "init"]:
            if d.exists():
                shutil.rmtree(d)
        # ---- wave -1: seed the frontier (init checkpoint) ----------------
        init_dir = _wave_dir(out, 0).parent / "init"
        (init_dir / "frontier").mkdir(parents=True, exist_ok=True)
        frontier0 = _seed_frontier(cfg, seeds if seeds is not None else corpus.seeds, prioritize)
        # split into multiple part files: a single-file frontier becomes ONE
        # read task next wave, serializing every downstream operator behind
        # one block-emitting reader (measured: ~2.5 s serial at 300k rows)
        rows_per_part = max(2048, min(20_000, (frontier0.num_rows // 64) + 1))
        for part, start in enumerate(range(0, max(frontier0.num_rows, 1), rows_per_part)):
            pq.write_table(
                frontier0.slice(start, rows_per_part),
                init_dir / "frontier" / f"part-{part:05d}.parquet",
            )
        seen.add_urls(frontier0.column("url").to_pylist(), wave=-1)
        seen.checkpoint(init_dir / "seen")
        hosts_state.checkpoint(init_dir / "hosts.parquet")
        (init_dir / "manifest.json").write_text(
            json.dumps(
                {
                    "wave": -1,
                    "completed": True,
                    "total_fetched": 0,
                    "n_frontier": frontier0.num_rows,
                    "files": {"frontier": _file_lineage(init_dir / "frontier")},
                }
            )
        )
        prev_frontier = init_dir / "frontier"
        # the seed pass already knows wave 0's Discovered hosts/count — skip
        # wave 0's full frontier scan for the host histogram
        seed_hosts = sorted(set(frontier0.column("host").to_pylist()))
        seed_count = frontier0.num_rows

    process_fetched = make_process_fetched_stage(cfg)
    normalize = make_normalize_stage(cfg)
    scope = make_scope_filter_stage(cfg)

    reject_accum = HashAccumulator.remote()
    host_accum = HostSetAccumulator.remote()
    # fetch substrate: prefer the hash-sorted layout (row-group-pruned reads,
    # O(selected) per wave); fall back to the full-corpus broadcast semi-join
    # scan for corpora without it. The fallback read op is created ONCE:
    # read-op creation lists files + resolves metadata on the driver
    # (~1.7 s at 1M pages) — re-creating it per wave is pure overhead.
    hashed_dir = getattr(corpus, "hashed_dir", None)
    use_pruned = bool(hashed_dir) and Path(hashed_dir).exists()
    corpus_ds = (
        None if use_pruned else rd.read_parquet(corpus.pages_dir, columns=FETCH_COLUMNS)
    )
    # hosts of next wave's Discovered rows, carried over from the previous
    # wave's frontier-write side-channel (None -> fall back to a scan, e.g.
    # on the first wave of this process or after resume)
    carried_hosts: list[str] | None = None
    n_discovered_est: int | None = None
    # previous frontier's row count, carried wave-over-wave so n_new never
    # needs a full metadata rescan of the previous checkpoint
    prev_frontier_rows: int | None = None
    if not resume:
        carried_hosts = seed_hosts
        n_discovered_est = seed_count
        prev_frontier_rows = seed_count
    elif summary.per_wave:
        prev_frontier_rows = summary.per_wave[-1].get("n_frontier")

    for wave in range(start_wave, cfg.max_waves):
        t0 = time.perf_counter()
        step_t = {}

        def _mark(name: str, _s=[t0]) -> None:
            now = time.perf_counter()
            step_t[name] = round(now - _s[0], 3)
            _s[0] = now

        now_s = wave * cfg.wave_duration_s
        wdir = _wave_dir(out, wave)
        # a crash mid-wave leaves a dir without a completed manifest; wipe it
        # so re-written parquet dirs don't accumulate stale part files
        manifest_path = wdir / "manifest.json"
        if wdir.exists() and not (
            manifest_path.exists()
            and json.loads(manifest_path.read_text()).get("completed")
        ):
            import shutil

            shutil.rmtree(wdir)
        metrics: dict = {"wave": wave, "completed": False}

        frontier = rd.read_parquet(str(prev_frontier))
        eligible = frontier.map_batches(
            lambda t: t.filter(pc.equal(t["status"], STATUS_DISCOVERED)),
            batch_format="pyarrow",
        )

        # ---- host-prep (C3/C4/A3) ---------------------------------------
        if carried_hosts is not None:
            # host set carried from the previous frontier-write pass
            hosts_needed = carried_hosts
            n_eligible = int(n_discovered_est or 0)
        else:
            # shuffle-free host histogram: per-batch partials, driver merge
            partials = _collect_arrow(
                eligible.map_batches(partial_host_counts, batch_format="pyarrow")
            )
            if partials is not None:
                host_counts = partials.to_pandas().groupby("host", sort=False)["n"].sum()
                hosts_needed = host_counts.index.tolist()
                n_eligible = int(host_counts.sum())
            else:
                hosts_needed = []
                n_eligible = 0
        _mark("host_histogram")
        n_robots = _host_prep(cfg, hosts_state, corpus.robots_path, hosts_needed, now_s)
        wdir.mkdir(parents=True, exist_ok=True)
        hosts_state.checkpoint(wdir / "hosts.parquet")
        hosts_ref = ray.put(hosts_state.broadcast_payload(now_s))
        delay_ref = ray.put(hosts_state.delay_payload(now_s))
        metrics.update(
            n_eligible=n_eligible,
            n_hosts_eligible=len(hosts_needed),
            n_robots_fetched=n_robots,
        )
        _mark("host_prep")

        # ---- strict robots (C2) + politeness selection (D1/D2) ----------
        # one pass: allowed rows stream into the shuffle-free partial top-k
        # selection; rejects side-channel into the accumulator
        allowed = eligible.map_batches(
            make_strict_robots_filter(hosts_ref, reject_accum),
            batch_format="pyarrow",
        )
        selected_raw = select_wave(allowed, delay_ref, cfg, n_eligible_hint=n_eligible)
        disallowed_hashes = ray.get(reject_accum.drain.remote())
        n_selected = len(selected_raw)
        budget_left = cfg.max_pages - total_fetched
        metrics["n_disallowed"] = int(len(disallowed_hashes))
        _mark("select")

        if n_selected == 0:
            # terminal wave: write final frontier (status updates only)
            processed_ref = ray.put(np.array([], dtype=np.uint64))
            disallowed_ref = ray.put(disallowed_hashes)
            frontier_next = frontier.map_batches(
                make_update_status(processed_ref, disallowed_ref),
                batch_format="pyarrow",
            )
            frontier_next.write_parquet(str(wdir / "frontier"))
            (wdir / "processed").mkdir(parents=True, exist_ok=True)
            (wdir / "selected").mkdir(parents=True, exist_ok=True)
            seen.checkpoint(wdir / "seen")
            metrics.update(
                n_selected=0,
                n_new=0,
                n_frontier=_parquet_rows(wdir / "frontier"),
                total_fetched=total_fetched,
                duration_s=round(time.perf_counter() - t0, 3),
                completed=True,
                files={"frontier": _file_lineage(wdir / "frontier")},
            )
            (wdir / "manifest.json").write_text(json.dumps(metrics))
            summary.per_wave.append(metrics)
            summary.waves = wave + 1
            log(f"[crawl] wave {wave}: frontier drained, stopping")
            break

        # canonical ordering + budget trim (driver-side: the selected set is
        # politeness-bounded; at 10^8-host scale this becomes a distributed
        # sort by (priority desc, url asc) + limit)
        sel_df = rank_selected(selected_raw)
        if len(sel_df) > budget_left:
            sel_df = sel_df.iloc[: int(budget_left)].copy()
        sel_df["wave"] = np.int32(wave)
        (wdir / "selected").mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(
                sel_df[["wave", "host", "rank_in_host", "global_rank", "url", "priority", "depth"]],
                preserve_index=False,
            ),
            wdir / "selected" / "part-0.parquet",
        )
        n_selected = len(sel_df)

        # ---- fetch-sim (A2) + process (A7, B1-B3) -----------------------
        # ONE Ray execution, shuffle-free: the wave's (url_hash, depth)
        # pairs are broadcast and the corpus is scanned in parallel with a
        # vectorized semi-join -> html parse (text+links) -> processed
        # parquet. The checkpoint doubles as (a) the extracted-text artifact
        # (rows with is_html), (b) the candidate source, and (c) the metrics
        # source — read back cheaply, never recomputed.
        sel_hashes = hash64(sel_df["url"].tolist())
        sel_order = np.argsort(sel_hashes)
        sel_sorted = sel_hashes[sel_order]
        sel_ref = ray.put(
            (sel_sorted, sel_df["depth"].to_numpy()[sel_order].astype(np.int32))
        )
        if use_pruned:
            items = plan_pruned_fetch(hashed_dir, sel_sorted)
            metrics["fetch_row_groups"] = int(sum(len(i["rgs"]) for i in items))
            metrics["fetch_tasks"] = len(items)
            if items:
                fetched = rd.from_items(
                    items, override_num_blocks=len(items)
                ).map_batches(
                    make_pruned_fetch_reader(sel_ref, cfg.max_content_length),
                    batch_format="pyarrow",
                )
            else:
                from abwcf_ray.stages.fetch import empty_fetched_table

                fetched = rd.from_arrow(empty_fetched_table())
        else:
            fetched = corpus_ds.map_batches(
                make_fetch_scan(sel_ref, cfg.max_content_length),
                batch_format="pyarrow",
            )
        # NOTE: no min_rows_per_file here — Ray's write-coalescing buffers
        # whole text+links blocks row-wise and serialized this write 13x
        # (measured 67 s vs 4.9 s on a 100k-page wave); the reader blocks
        # are already file-sized. zstd over snappy: the processed checkpoint
        # is the wave's dominant write (~1 GB of text+links per 237k pages);
        # trading shared-disk bytes for per-task compression CPU keeps the
        # step scaling with workers on one box, and shrinks checkpoints.
        fetched.map_batches(process_fetched, batch_format="pyarrow").write_parquet(
            str(wdir / "processed"), compression="zstd"
        )
        _mark("fetch_process")

        processed = rd.read_parquet(str(wdir / "processed"))
        import pyarrow.dataset as pads

        flags = pads.dataset(str(wdir / "processed")).to_table(
            columns=["fetch_status", "is_html", "length_exceeded"]
        )
        vc = pc.value_counts(flags.column("fetch_status").combine_chunks())
        status_hist = {
            int(vc.field("values")[i].as_py()): int(vc.field("counts")[i].as_py())
            for i in range(len(vc))
        }
        # body-cap class (Fetcher.scala:168-170): consumed, never parsed
        n_len_exceeded = int(pc.sum(flags.column("length_exceeded")).as_py() or 0)
        if n_len_exceeded:
            status_hist["length_limit_exceeded"] = n_len_exceeded
        # selected urls absent from the corpus are 404s (they produce no
        # processed row; the page still ends Processed in the frontier)
        n_matched = int(flags.num_rows)
        if n_selected > n_matched:
            status_hist[404] = status_hist.get(404, 0) + (n_selected - n_matched)
        n_extracted = int(pc.sum(flags.column("is_html")).as_py() or 0)
        _mark("extract_write")

        # ---- candidate pipeline (B1 -> B4 -> B5 -> C1 -> F1 -> B7) ------
        # Wave-dedup + seen-filter run as a TWO-PHASE shard-actor protocol
        # instead of a groupby(url) all-to-all: the materialize() barrier
        # completes every `propose` (min-depth per url) before any `claim`
        # (first-wins arbitration + seen registration) runs — the same
        # single-writer-per-url mechanism as the reference's sharded
        # PageManager entities. The materialized set is politeness-bounded
        # (links of this wave's fetches, html long since dropped).
        cand_m = (
            processed.map_batches(explode_links, batch_format="pyarrow")
            .map_batches(normalize, batch_format="pyarrow")
            .map_batches(scope, batch_format="pyarrow")
            .map_batches(make_lenient_robots_filter(hosts_ref), batch_format="pyarrow")
            .map_batches(make_propose(seen, wave), batch_format="pyarrow")
            .materialize()
        )
        _mark("candidates")
        # claim phase: one task per materialized block, token = block index
        # (unique per claimant, stable across task retries — see
        # transform.claim_batch)
        claim_refs = [
            _claim_block.remote(block, idx, seen, wave, host_accum, cfg)
            for idx, block in enumerate(cand_m.to_arrow_refs())
        ]
        # no barrier here: claim tasks overlap the update_status scan of the
        # frontier-write execution below, which consumes them via union
        new_rows = rd.from_arrow_refs(claim_refs)

        # ---- frontier update + checkpoint -------------------------------
        processed_ref = ray.put(sel_sorted)
        disallowed_ref = ray.put(disallowed_hashes)
        frontier_next = frontier.map_batches(
            make_update_status(processed_ref, disallowed_ref, host_accum),
            batch_format="pyarrow",
        ).union(new_rows)
        # no min_rows_per_file: Ray's write coalescing re-buffers blocks
        # row-wise (measured +0.4 s here, 13x on the processed write);
        # update_status blocks are already file-sized
        frontier_next.write_parquet(str(wdir / "frontier"))
        carried_hosts = ray.get(host_accum.drain.remote())
        try:  # per-stage Ray Data stats for the wave's heaviest execution
            metrics["ray_stats"] = frontier_next.stats()[:4000]
        except Exception:
            pass
        _mark("frontier_write")

        seen.checkpoint(wdir / "seen")
        _mark("seen_ckpt")
        total_fetched += n_selected
        lineage = {
            "frontier": _file_lineage(wdir / "frontier"),
            "processed": _file_lineage(wdir / "processed"),
            "selected": _file_lineage(wdir / "selected"),
        }
        n_frontier = sum(f["rows"] for f in lineage["frontier"])
        if prev_frontier_rows is None:
            prev_frontier_rows = _parquet_rows(Path(prev_frontier))
        metrics.update(
            n_selected=n_selected,
            fetch_status=status_hist,
            n_extracted=n_extracted,
            n_new=n_frontier - prev_frontier_rows,
            n_frontier=n_frontier,
            total_fetched=total_fetched,
            seen_size=seen.size(),
            duration_s=round(time.perf_counter() - t0, 3),
            step_times=step_t,
            completed=True,
            files=lineage,
        )
        prev_frontier_rows = n_frontier
        (wdir / "manifest.json").write_text(json.dumps(metrics))
        summary.per_wave.append(metrics)
        summary.waves = wave + 1
        prev_frontier = wdir / "frontier"
        # exact arithmetic for the next wave's eligible-count metric
        n_discovered_est = (
            n_eligible - n_selected - int(len(disallowed_hashes)) + metrics["n_new"]
        )
        log(
            f"[crawl] wave {wave}: eligible={metrics['n_eligible']} "
            f"selected={n_selected} new={metrics['n_new']} "
            f"frontier={n_frontier} ({metrics['duration_s']}s)"
        )
        if total_fetched >= cfg.max_pages:
            log(f"[crawl] page budget reached ({total_fetched})")
            break

    summary.total_fetched = total_fetched
    summary.final_frontier_rows = _parquet_rows(Path(prev_frontier))
    summary.seen_size = seen.size()
    seen.shutdown()
    return summary


def restore_topk(frontier_dir: str | Path, k: int):
    """A6/D4 bounded-restore scan: ``SELECT ... WHERE status='Discovered'
    ORDER BY crawl_priority DESC LIMIT k`` (SlickPageRepository.scala:58-61,
    PageRestorer.scala:37-53). The wave model restores everything by default;
    this is the bounded variant for driving a partial re-injection."""
    ds = rd.read_parquet(str(frontier_dir)).map_batches(
        lambda t: t.filter(pc.equal(t["status"], STATUS_DISCOVERED)),
        batch_format="pyarrow",
    )
    return ds.sort(["priority", "url"], descending=[True, False]).limit(k)


def load_config_toml(path: str | Path) -> CrawlConfig:
    """CrawlConfig from a TOML file (the rebuild of the reference's HOCON
    surface, reference.conf:8-251 / CrawlerSettings.scala:5-14). Keys match
    the dataclass field names; unknown keys raise."""
    import tomllib

    data = tomllib.loads(Path(path).read_text())
    norm = data.pop("normalization", None)
    kwargs = dict(data)
    for tuple_key in ("must_match", "must_not_match", "user_agents"):
        if tuple_key in kwargs:
            kwargs[tuple_key] = tuple(kwargs[tuple_key])
    if norm is not None:
        from abwcf_ray.config import NormalizationConfig

        kwargs["normalization"] = NormalizationConfig(**norm)
    return CrawlConfig(**kwargs)


def main() -> None:  # pragma: no cover — CLI entry
    import argparse

    parser = argparse.ArgumentParser(description="Run a simulated crawl.")
    parser.add_argument("--n-pages", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--out", default="/tmp/abwcf_crawl")
    parser.add_argument("--corpus-dir", default=None)
    parser.add_argument("--config", default=None, help="TOML CrawlConfig file")
    parser.add_argument("--max-waves", type=int, default=50)
    parser.add_argument("--max-depth", type=int, default=2**31 - 1)
    parser.add_argument("--wave-duration", type=float, default=10.0)
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from abwcf_ray.sources.corpus import generate_corpus

    corpus_dir = args.corpus_dir or f"/tmp/abwcf_corpus_{args.n_pages}_{args.seed}"
    corpus = generate_corpus(corpus_dir, n_pages=args.n_pages, seed=args.seed)
    if args.config:
        cfg = load_config_toml(args.config)
    else:
        cfg = CrawlConfig(
            max_waves=args.max_waves,
            max_crawl_depth=args.max_depth,
            wave_duration_s=args.wave_duration,
        )
    summary = run_crawl(cfg, corpus, args.out, resume=args.resume)
    print(
        json.dumps(
            {
                "waves": summary.waves,
                "total_fetched": summary.total_fetched,
                "frontier_rows": summary.final_frontier_rows,
                "seen_size": summary.seen_size,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":  # pragma: no cover
    main()
