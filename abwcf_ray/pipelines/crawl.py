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
    frontier' = DELTA checkpoint: new rows append as ``delta/`` part files
                and status changes (politeness-bounded) append as a tiny
                ``flips.parquet`` — O(changed) per wave, never a frontier
                rewrite (the Ray analog of the reference's batched
                ``UPDATE pages SET status``, SlickPageRepository.scala:37-51,
                Batcher.scala:14-62). The logical frontier is
                base ∪ deltas with the accumulated flips overlaid at read
                time (`make_eligible_filter` / `frontier_dataset`); the
                chain is folded into a fresh materialized base every
                ``cfg.frontier_compact_every`` waves and at frontier drain.

The steady-state wave contains NO all-to-all exchange and NO O(frontier)
write (see stages/schedule, stages/fetch, state/seen docstrings for each
replacement).

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
    plan_pruned_fetch,
)
from abwcf_ray.stages.schedule import rank_selected, rank_selected_ds, select_wave
from abwcf_ray.stages.transform import (
    FRONTIER_SCHEMA,
    STATUS_DISALLOWED,
    STATUS_DISCOVERED,
    STATUS_PROCESSED,
    explode_links,
    make_eligible_filter,
    apply_robots_filter_bucketed,
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
from abwcf_ray.state.seen import HostCountSink, RejectSink, SeenSet

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
    warmup_s: float = 0.0
    per_wave: list[dict] = field(default_factory=list)

    @property
    def last_wave_dir(self) -> str:
        return str(Path(self.out_dir) / f"wave_{self.waves - 1:04d}")


def _sorted_union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two SORTED unique uint64 arrays. np.union1d quicksorts the
    concatenation (O(F log F) comparisons on up to frontier_compact_max_flips
    elements, twice per wave on the driver); a stable sort of two sorted
    runs is adaptive/radix for ints, then one diff pass dedups — same
    result, linear-ish."""
    if not len(a):
        return b
    if not len(b):
        return a
    c = np.concatenate([a, b])
    c.sort(kind="stable")
    keep = np.r_[True, c[1:] != c[:-1]]
    return c[keep]


def _wave_dir(out_dir: Path, n: int) -> Path:
    return out_dir / f"wave_{n:04d}"


def _file_lineage(directory: Path) -> list[dict]:
    out = []
    for f in sorted(directory.rglob("*.parquet")):
        out.append({"file": str(f.relative_to(directory)), "rows": pq.read_metadata(f).num_rows})
    return out


def _parquet_rows(directory: Path) -> int:
    return sum(pq.read_metadata(f).num_rows for f in directory.rglob("*.parquet"))


class _HostLedger:
    """Columnar Discovered-per-host ledger: parallel arrays sorted by
    ``hash64(host)`` (hash, count, host string). Per-wave updates (selected
    − rejects + claims) are politeness-bounded vectorized merges; the
    per-wave reads — eligible hosts, eligible total, negative-drift check —
    are numpy masks, never an O(#hosts) Python comprehension (the same
    flaw class the round-2 hosts-table dict had, fixed the same way)."""

    __slots__ = ("h", "c", "host")

    def __init__(self) -> None:
        self.h = np.empty(0, np.uint64)
        self.c = np.empty(0, np.int64)
        self.host = np.empty(0, object)

    @classmethod
    def from_counts(cls, hosts, counts) -> "_HostLedger":
        led = cls()
        led.apply(hosts, counts)
        return led

    def apply(self, hosts, deltas) -> None:
        hosts = np.asarray(list(hosts), dtype=object)
        if not len(hosts):
            return
        hh = hash64(hosts)
        dd = np.asarray(deltas, dtype=np.int64)
        order = np.argsort(hh, kind="stable")
        hh, dd, hosts = hh[order], dd[order], hosts[order]
        uniq = np.ones(len(hh), dtype=bool)
        uniq[1:] = hh[1:] != hh[:-1]
        if not uniq.all():
            dd = np.add.reduceat(dd, np.flatnonzero(uniq))
            hh, hosts = hh[uniq], hosts[uniq]
        if len(self.h):
            pos = np.minimum(np.searchsorted(self.h, hh), len(self.h) - 1)
            found = self.h[pos] == hh
            np.add.at(self.c, pos[found], dd[found])
        else:
            found = np.zeros(len(hh), dtype=bool)
        if not found.all():
            new = ~found
            mh = np.concatenate([self.h, hh[new]])
            o = np.argsort(mh, kind="stable")
            self.h = mh[o]
            self.c = np.concatenate([self.c, dd[new]])[o]
            self.host = np.concatenate([self.host, hosts[new]])[o]

    def eligible(self) -> tuple[np.ndarray, int]:
        """(host strings with count > 0, Σ eligible counts) — one mask."""
        mask = self.c > 0
        return self.host[mask], int(self.c[mask].sum())

    def has_negative(self) -> bool:
        return bool(len(self.c)) and bool((self.c < 0).any())

    def prune(self) -> None:
        mask = self.c > 0
        if not mask.all():
            self.h, self.c, self.host = self.h[mask], self.c[mask], self.host[mask]


class _FrontierChain:
    """Driver-side ledger of the frontier checkpoint chain.

    The frontier on disk is ``base`` (a materialized parquet dir) plus an
    append-only list of per-wave ``delta/`` dirs (new Discovered rows) and
    ``flips.parquet`` files (url_hash -> new status; politeness-bounded).
    Rows are immutable once written — a wave changes the frontier only by
    appending. The cumulative flip hashes are also held here as sorted
    uint64 arrays for the per-wave broadcast (their size is bounded by
    pages fetched since the last compaction, and compaction resets them).
    """

    def __init__(self, out: Path, base: Path):
        self.out = Path(out)
        self.base = Path(base)
        self.deltas: list[Path] = []
        self.flip_files: list[Path] = []
        self.cum_processed = np.empty(0, dtype=np.uint64)
        self.cum_disallowed = np.empty(0, dtype=np.uint64)

    def sources(self) -> list[str]:
        # read_parquet's multi-path form takes FILES; expand each dir (the
        # listing is O(chain length × part files), driver-side, cheap).
        # rglob: a compacted base is status-split into discovered/ +
        # settled/ subdirs (see _compact_frontier)
        out: list[str] = []
        for d in [self.base] + self.deltas:
            out.extend(str(p) for p in sorted(Path(d).rglob("*.parquet")))
        return out

    def eligible_sources(self) -> list[str]:
        """Parts that can contain ELIGIBLE (Discovered, unflipped) rows:
        the base's discovered/ split if it has one (compaction writes the
        frontier status-partitioned, so a mature crawl's eligible scan is
        O(Discovered), not O(frontier)) plus every delta (deltas are new
        rows, all Discovered). Falls back to every part for an un-split
        base (the init frontier) or an empty split."""
        out: list[str] = []
        disc = Path(self.base) / "discovered"
        base_parts = (
            sorted(str(p) for p in disc.rglob("*.parquet")) if disc.exists() else []
        )
        if not base_parts:
            base_parts = sorted(str(p) for p in Path(self.base).rglob("*.parquet"))
        out.extend(base_parts)
        for d in self.deltas:
            out.extend(str(p) for p in sorted(Path(d).rglob("*.parquet")))
        return out

    def flips_merged(self) -> np.ndarray:
        return _sorted_union(self.cum_processed, self.cum_disallowed)

    def add_wave(
        self,
        delta_dir: Path | None,
        flips_path: Path | None,
        processed: np.ndarray,
        disallowed: np.ndarray,
    ) -> None:
        if delta_dir is not None:
            self.deltas.append(Path(delta_dir))
        if flips_path is not None:
            self.flip_files.append(Path(flips_path))
        if len(processed):
            self.cum_processed = _sorted_union(self.cum_processed, processed)
        if len(disallowed):
            self.cum_disallowed = _sorted_union(
                self.cum_disallowed, disallowed
            )

    def reset(self, base: Path) -> None:
        self.base = Path(base)
        self.deltas = []
        self.flip_files = []
        self.cum_processed = np.empty(0, dtype=np.uint64)
        self.cum_disallowed = np.empty(0, dtype=np.uint64)

    def manifest_entry(self) -> dict:
        return {
            "base": str(self.base.relative_to(self.out)),
            "deltas": [str(d.relative_to(self.out)) for d in self.deltas],
            "flips": [str(f.relative_to(self.out)) for f in self.flip_files],
        }

    @classmethod
    def from_manifest(cls, out: Path, manifest: dict) -> "_FrontierChain":
        entry = manifest["frontier_chain"]
        chain = cls(out, out / entry["base"])
        chain.deltas = [out / d for d in entry["deltas"]]
        chain.flip_files = [out / f for f in entry["flips"]]
        proc, dis = _load_flips(out, entry["flips"])
        chain.cum_processed, chain.cum_disallowed = proc, dis
        return chain


def _load_flips(out: Path, flip_relpaths: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Cumulative (processed, disallowed) sorted hash arrays from the
    chain's flips files (each politeness-bounded, so this is O(fetched
    since last compaction), read on the driver)."""
    proc_parts, dis_parts = [], []
    for rel in flip_relpaths:
        t = pq.read_table(out / rel)
        h = t.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        s = np.asarray(t.column("status").to_pylist(), dtype=object)
        proc_parts.append(h[s == STATUS_PROCESSED])
        dis_parts.append(h[s == STATUS_DISALLOWED])
    proc = np.unique(np.concatenate(proc_parts)) if proc_parts else np.empty(0, np.uint64)
    dis = np.unique(np.concatenate(dis_parts)) if dis_parts else np.empty(0, np.uint64)
    return proc.astype(np.uint64), dis.astype(np.uint64)


def _write_flips(path: Path, processed: np.ndarray, disallowed: np.ndarray) -> int:
    h = np.concatenate([processed.astype(np.uint64), disallowed.astype(np.uint64)])
    status = [STATUS_PROCESSED] * len(processed) + [STATUS_DISALLOWED] * len(disallowed)
    pq.write_table(
        pa.table(
            {
                "url_hash": pa.array(h, pa.uint64()),
                "status": pa.array(status, pa.string()),
            }
        ),
        path,
    )
    return len(h)


def _compact_frontier(chain: _FrontierChain, dest: Path) -> None:
    """Fold base + deltas + flips into a fresh materialized frontier at
    ``dest`` and reset the chain onto it. O(frontier) — runs only every
    ``frontier_compact_every`` waves or at drain, never steady-state.

    The output is STATUS-SPLIT: ``dest/discovered`` holds the rows still
    eligible for selection, ``dest/settled`` everything else. A mature
    crawl's frontier is dominated by Processed rows, so splitting at the
    (already O(frontier)) compaction makes every subsequent wave's
    eligible scan O(Discovered) instead of O(frontier)
    (``_FrontierChain.eligible_sources``) — the Ray analog of the
    reference DB's status index. Two streaming passes over the chain (one
    per split) keep compaction memory flat instead of materializing the
    frontier in the object store."""

    def _folded():
        ds = rd.read_parquet(chain.sources())
        if len(chain.cum_processed) or len(chain.cum_disallowed):
            ds = ds.map_batches(
                make_update_status(
                    ray.put(chain.cum_processed), ray.put(chain.cum_disallowed)
                ),
                batch_format="pyarrow",
            )
        return ds

    def keep_discovered(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["status"], STATUS_DISCOVERED))

    def keep_settled(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.equal(batch["status"], STATUS_DISCOVERED)))

    _folded().map_batches(keep_discovered, batch_format="pyarrow").write_parquet(
        str(dest / "discovered")
    )
    _folded().map_batches(keep_settled, batch_format="pyarrow").write_parquet(
        str(dest / "settled")
    )
    chain.reset(dest)


def frontier_dataset(wave_dir: str | Path) -> "rd.Dataset":
    """The logical frontier as of a completed wave: the materialized
    ``frontier/`` dir if that wave compacted (or drained), else the chain
    recorded in its manifest (base + deltas with status flips overlaid).
    This is the read path a resume, a restore, or a downstream consumer
    uses — the full frontier is never rewritten to serve a read."""
    wd = Path(wave_dir)
    mat = wd / "frontier"
    if mat.exists() and any(mat.rglob("*.parquet")):
        return rd.read_parquet(str(mat))
    manifest = json.loads((wd / "manifest.json").read_text())
    out = wd.parent
    chain = _FrontierChain.from_manifest(out, manifest)
    ds = rd.read_parquet(chain.sources())
    if len(chain.cum_processed) or len(chain.cum_disallowed):
        ds = ds.map_batches(
            make_update_status(
                ray.put(chain.cum_processed), ray.put(chain.cum_disallowed)
            ),
            batch_format="pyarrow",
        )
    return ds


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
            sim = hosts_state._sim = (
                cfg.robots_transport()
                if cfg.robots_transport is not None
                else RobotsFetchSim(robots_path, cfg)
            )
        batch = pa.table(
            {
                "host": pa.array(need, pa.string()),
                "now_s": pa.array([now_s] * len(need), pa.float64()),
            }
        )
        hosts_state.merge_fetched(sim(batch))
    else:
        ds = rd.from_items([{"host": h, "now_s": now_s} for h in need])
        if cfg.robots_transport is not None:
            factory = cfg.robots_transport

            class _RobotsStage:
                def __init__(self):
                    self._inner = factory()

                def __call__(self, b: pa.Table) -> pa.Table:
                    return self._inner(b)

            stage_cls, ctor_args = _RobotsStage, ()
        else:
            stage_cls, ctor_args = RobotsFetchSim, (robots_path, cfg)
        fetched = ds.map_batches(
            stage_cls,
            fn_constructor_args=ctor_args,
            batch_format="pyarrow",
            batch_size=256,
            # the reference's gate of 5 concurrent robots fetches is PER NODE
            # (reference.conf:245); an elastic pool is the multi-node analog
            concurrency=(2, 16),
        )
        hosts_state.merge_fetched(_collect_arrow(fetched))
    return len(need)


@ray.remote
def _claim_chunk(
    token: int,
    seen_set,
    wave: int,
    host_accum,
    cfg: CrawlConfig,
    delta_dir: str,
    *blocks: pa.Table,
) -> int:
    """Claim + prioritize + WRITE one delta part for one CHUNK of candidate
    blocks; returns the chunk's claimed-row count. Chunking matters: the
    claim protocol fans one RPC per seen shard per call, so claiming per
    materialized block (hundreds per wave) costs thousands of serialized
    actor round-trips — a measured ~2 s constant per wave at any
    parallelism. One concat + one claim per chunk keeps the shard work
    vectorized and the RPC count at O(chunks × shards).

    The delta part is written HERE (the same retry-safe side-effect tee as
    the fused fetch stage): ``token`` is the chunk index — unique per
    claimant, stable across retries, and the part name is a pure function
    of it, so a re-executed chunk overwrites its own part with identical
    content. Writing in-task removes a whole second Dataset execution
    (from_arrow_refs -> write_parquet) whose fixed cost was a measured
    ~0.4 s per wave at any parallelism — the claimed rows never travel
    driver-ward at all."""
    from abwcf_ray.stages.transform import claim_batch, make_prioritize_stage

    tables = [b for b in blocks if b.num_rows and "url" in b.schema.names]
    if not tables:
        return 0
    t = pa.concat_tables(tables, promote_options="default").combine_chunks()
    out = claim_batch(t, seen_set, wave, token, host_accum)
    out = make_prioritize_stage(cfg)(out)
    status = pa.array([STATUS_DISCOVERED] * out.num_rows, pa.string())
    out = out.append_column("status", status).select(
        ["url", "host", "status", "depth", "priority"]
    )
    if out.num_rows:
        pq.write_table(out, Path(delta_dir) / f"part-{token:05d}.parquet")
    return out.num_rows


@ray.remote
def _rank_write_selected(sel_table: pa.Table, wave: int, path: str) -> int:
    """Rank (rank_selected: priority desc, url asc; per-host + global
    ranks) and write one wave's selected manifest — OFF the wave critical
    path: in the untrimmed case the fetch set is rank-independent, so this
    runs on a worker while the fused fetch pipeline executes (driver rank
    + write measured ~0.5 s at 244k selected, ~1.9 s at 890k). The output
    parquet is byte-identical to the inline path (same rank_selected, same
    column order); the wave joins the ref before lineage reads the file."""
    from abwcf_ray.stages.schedule import rank_selected

    df = rank_selected(sel_table.to_pandas())
    df["wave"] = np.int32(wave)
    pq.write_table(
        pa.Table.from_pandas(
            df[["wave", "host", "rank_in_host", "global_rank", "url", "priority", "depth"]],
            preserve_index=False,
        ),
        path,
    )
    return len(df)


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
    seen = SeenSet(
        cfg.seen_shards,
        backend=cfg.seen_backend,
        cuckoo_capacity=cfg.seen_cuckoo_capacity,
    )
    content_seen = (
        SeenSet(
            cfg.seen_shards,
            backend=cfg.seen_backend,
            cuckoo_capacity=cfg.seen_cuckoo_capacity,
        )
        if cfg.dedup_content
        else None
    )
    hosts_state = HostsState(cfg)
    summary = CrawlSummary(out_dir=str(out))
    total_fetched = 0
    start_wave = 0

    chain: _FrontierChain | None = None
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
            if content_seen is not None and (last / "content_seen").exists():
                content_seen.restore(last / "content_seen")
            hosts_state.restore(last / "hosts.parquet")
            summary.per_wave = [
                json.loads((d / "manifest.json").read_text()) for d in completed
            ]
            chain = _FrontierChain.from_manifest(out, manifest)
            # a no-op resume (last completed wave was max_waves-1) must
            # still point last_wave_dir at the completed wave, not wave_-001
            summary.waves = start_wave
            summary.total_fetched = total_fetched
            summary.final_frontier_rows = int(
                manifest.get("n_frontier") or 0
            )
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
        chain = _FrontierChain(out, init_dir / "frontier")
        # the seed pass already knows wave 0's Discovered-per-host ledger —
        # skip wave 0's full frontier scan for the host histogram
        seed_counts = frontier0.column("host").to_pandas().value_counts()
        seed_ledger = _HostLedger.from_counts(
            seed_counts.index.to_numpy(dtype=object), seed_counts.to_numpy()
        )

    process_fetched = make_process_fetched_stage(cfg)
    normalize = make_normalize_stage(cfg)
    scope = make_scope_filter_stage(cfg)

    reject_accum = RejectSink(cfg.accum_shards)
    host_accum = HostCountSink(cfg.accum_shards)
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
    # Discovered-per-host ledger, maintained arithmetically wave-over-wave
    # (seeds + claims − selected − rejects, each politeness-bounded) so the
    # host histogram never rescans the frontier. None -> rebuild by one
    # partial-counts scan (first wave after a resume). Driver memory is
    # O(#live hosts) in COLUMNAR arrays (_HostLedger) — the same bound and
    # the same shape as the hosts table itself (state/hosts.py).
    host_ledger: _HostLedger | None = None
    # previous frontier's row count, carried wave-over-wave so n_new never
    # needs a full metadata rescan of the previous checkpoint
    prev_frontier_rows: int | None = None
    if not resume:
        host_ledger = seed_ledger
        prev_frontier_rows = frontier0.num_rows
    elif summary.per_wave:
        prev_frontier_rows = summary.per_wave[-1].get("n_frontier")

    # ---- session warm-up (outside the per-wave timers) ------------------
    # Actor pools and Ray Data's sort-exchange machinery spawn lazily on
    # first use, which would otherwise bill ~2 s of ONE-TIME bring-up to
    # the first wave's steps (measured: wave-0 select 2.6 s vs 0.63 s at
    # wave 1+ on identical input — tools/bench_wave_steps.py). A production
    # run amortizes bring-up over thousands of waves; recorded as
    # summary.warmup_s so single-wave benchmarks see steady-state waves.
    tw = time.perf_counter()
    reject_accum.drain()
    host_accum.drain()
    seen.size()
    if content_seen is not None:
        content_seen.size()
    (
        rd.range(256)
        .groupby("id")
        .map_groups(lambda g: g, batch_format="pandas")
        .materialize()
    )
    summary.warmup_s = round(time.perf_counter() - tw, 3)

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

        # logical frontier = base ∪ deltas, minus rows flipped since the
        # last compaction (broadcast sorted hashes, politeness-bounded)
        flips_ref = ray.put(chain.flips_merged())
        # eligible scan reads only parts that can hold Discovered rows —
        # O(Discovered) once the base has a status-split compaction
        frontier = rd.read_parquet(chain.eligible_sources())
        eligible = frontier.map_batches(
            make_eligible_filter(flips_ref), batch_format="pyarrow"
        )

        # ---- host-prep (C3/C4/A3) ---------------------------------------
        if host_ledger is not None:
            hosts_needed, n_eligible = host_ledger.eligible()
        else:
            # shuffle-free host histogram: per-batch partials, driver merge
            partials = _collect_arrow(
                eligible.map_batches(partial_host_counts, batch_format="pyarrow")
            )
            host_ledger = _HostLedger()
            if partials is not None:
                host_counts = partials.to_pandas().groupby("host", sort=False)["n"].sum()
                host_ledger.apply(
                    host_counts.index.to_numpy(dtype=object), host_counts.to_numpy()
                )
            hosts_needed, n_eligible = host_ledger.eligible()
        _mark("host_histogram")
        n_robots = _host_prep(cfg, hosts_state, corpus.robots_path, hosts_needed, now_s)
        wdir.mkdir(parents=True, exist_ok=True)
        hosts_state.checkpoint(wdir / "hosts.parquet")
        rules_payload = hosts_state.rules_payload(now_s)
        n_live_hosts = len(rules_payload["hash"])
        bucketed = n_live_hosts > cfg.hosts_broadcast_max
        if bucketed:
            # 10^8-host path: hash(host)-bucketed robots join — each
            # partition compiles ONE bucket's rules (config.py knobs)
            bucket_refs = [
                ray.put(p)
                for p in hosts_state.bucketed_rules_payload(now_s, cfg.hosts_bucket_bits)
            ]
            hosts_ref = None
        else:
            hosts_ref = ray.put(rules_payload)
        del rules_payload
        sched_ref = ray.put(hosts_state.sched_payload(now_s, cfg.wave_duration_s))
        metrics.update(
            n_eligible=n_eligible,
            n_hosts_eligible=len(hosts_needed),
            n_robots_fetched=n_robots,
        )
        _mark("host_prep")

        # ---- strict robots (C2) + politeness selection (D1/D2) ----------
        # one pass: allowed rows stream into the shuffle-free partial top-k
        # selection; rejects side-channel into the accumulator
        if bucketed:
            allowed = apply_robots_filter_bucketed(
                eligible,
                bucket_refs,
                cfg.hosts_bucket_bits,
                strict=True,
                reject_accum=reject_accum,
            )
        else:
            allowed = eligible.map_batches(
                make_strict_robots_filter(hosts_ref, reject_accum),
                batch_format="pyarrow",
            )
        # past rank_distributed_min eligible rows the selected set may be
        # too large to sort on the driver: keep it distributed and rank it
        # with a Ray sort (rank_selected_ds); below, the driver pandas path
        # is lower-latency (both produce identical frames — parity test in
        # tests/test_schedule_seen.py)
        # big-eligible waves keep the exact merge distributed; the RANK path
        # then re-decides on the ACTUAL politeness-bounded selected count —
        # n_eligible is only a proxy, and a 2.4M-eligible wave selecting
        # 890k rows paid a full distributed sort (which re-executed the
        # lazy scan→robots→merge pipeline inside it: measured 14.0 s vs
        # 5.5 s) where a driver rank of <1M rows is cheap. materialize()
        # pins the merge result so neither rank path re-runs the scan.
        as_ds = n_eligible > cfg.rank_distributed_min
        selected_raw = select_wave(
            allowed, sched_ref, n_eligible_hint=n_eligible, as_dataset=as_ds
        )
        rank_distributed = False
        if not isinstance(selected_raw, pd.DataFrame):
            # the distributed-merge venue was taken (partials over the
            # driver cap): decide the rank venue on the actual selected
            # count the same way
            selected_raw = selected_raw.materialize()
            if selected_raw.count() > cfg.rank_distributed_min:
                rank_distributed = True
                selected_raw = rank_selected_ds(selected_raw)
            else:
                selected_raw = selected_raw.to_pandas()
        disallowed_hashes, disallowed_counts = reject_accum.drain()
        n_selected = len(selected_raw)
        budget_left = cfg.max_pages - total_fetched
        metrics["n_disallowed"] = int(len(disallowed_hashes))
        _mark("select")

        if n_selected == 0:
            # terminal wave: drain — fold this wave's disallowed flips into
            # the chain and compact to a final materialized frontier (the
            # one O(frontier) write of the run, at its end)
            if len(disallowed_hashes):
                flips_path = wdir / "flips.parquet"
                _write_flips(flips_path, np.empty(0, np.uint64), disallowed_hashes)
                chain.add_wave(None, flips_path, np.empty(0, np.uint64), disallowed_hashes)
            _compact_frontier(chain, wdir / "frontier")
            (wdir / "processed").mkdir(parents=True, exist_ok=True)
            (wdir / "selected").mkdir(parents=True, exist_ok=True)
            seen.checkpoint(wdir / "seen")
            if content_seen is not None:
                content_seen.checkpoint(wdir / "content_seen")
            n_frontier = _parquet_rows(wdir / "frontier")
            metrics.update(
                n_selected=0,
                n_new=0,
                n_frontier=n_frontier,
                total_fetched=total_fetched,
                duration_s=round(time.perf_counter() - t0, 3),
                completed=True,
                files={"frontier": _file_lineage(wdir / "frontier")},
                frontier_chain=chain.manifest_entry(),
            )
            (wdir / "manifest.json").write_text(json.dumps(metrics))
            summary.per_wave.append(metrics)
            summary.waves = wave + 1
            prev_frontier_rows = n_frontier
            log(f"[crawl] wave {wave}: frontier drained, stopping")
            break

        # canonical ordering + budget trim + selected-manifest write. The
        # ranked manifest is consumed only by resume/goldens — never by
        # this wave's pipeline — and the FETCH set is rank-independent
        # unless the page budget trims it (trim = lowest global ranks
        # drop). So in the common untrimmed case the rank + parquet write
        # run in ONE remote task overlapping the fetch execution; the
        # driver ranks inline only when trimming, or when the distributed
        # rank already produced the ranked frame.
        (wdir / "selected").mkdir(parents=True, exist_ok=True)
        sel_path = wdir / "selected" / "part-0.parquet"
        need_trim = (not rank_distributed) and len(selected_raw) > budget_left
        sel_write_ref = None
        if rank_distributed or need_trim:
            sel_df = (
                selected_raw if rank_distributed else rank_selected(selected_raw)
            )
            if len(sel_df) > budget_left:
                sel_df = sel_df.iloc[: int(budget_left)].copy()
            sel_df["wave"] = np.int32(wave)
            pq.write_table(
                pa.Table.from_pandas(
                    sel_df[["wave", "host", "rank_in_host", "global_rank", "url", "priority", "depth"]],
                    preserve_index=False,
                ),
                sel_path,
            )
        else:
            sel_df = selected_raw  # unranked; membership == fetch set
            sel_write_ref = _rank_write_selected.remote(
                ray.put(
                    pa.Table.from_pandas(
                        sel_df[list(sel_df.columns)], preserve_index=False
                    )
                ),
                wave,
                str(sel_path),
            )
        n_selected = len(sel_df)

        # ---- FUSED wave pipeline: fetch-sim (A2) + process (A7, B1-B3) +
        # candidate chain (B4 -> B5 -> C1 -> F1 phase 1), ONE streaming
        # execution. The pruned reader, the parser, and the checkpoint tee
        # run inside one stage (stages/fetch.make_fetch_process_tee): each
        # work item reads only its hit row groups, parses, writes its own
        # processed-checkpoint part (deterministic name -> retry-safe), and
        # emits only (links, child_depth) downstream — so the candidate
        # chain overlaps the fetch instead of waiting for a full processed
        # write and re-reading it (measured: the old barrier serialized two
        # ~0.8-efficiency phases and decompressed the wave's dominant
        # payload twice). html never leaves the fused stage.
        sel_hashes = hash64(sel_df["url"].tolist())
        sel_order = np.argsort(sel_hashes)
        sel_sorted = sel_hashes[sel_order]
        sel_ref = ray.put(
            (sel_sorted, sel_df["depth"].to_numpy()[sel_order].astype(np.int32))
        )
        (wdir / "processed").mkdir(parents=True, exist_ok=True)
        # E2 — bandwidth split: the budget's binding consequence is the
        # concurrent-fetcher cap (FetcherManager.scala:66); apply it as the
        # fetch stage's Ray concurrency (results identical, parallelism
        # bounded; see CrawlConfig.total_bandwidth_budget_bps)
        max_fetchers = None
        if cfg.total_bandwidth_budget_bps:
            max_fetchers = max(
                1,
                int(cfg.total_bandwidth_budget_bps)
                // max(1, int(cfg.min_bandwidth_per_fetcher_bps)),
            )
            metrics["max_fetchers"] = max_fetchers
        if cfg.fetch_transport is not None:
            # injectable transport (H/A2, stages/transport.py): actor-pool
            # fetch over the selected (url, depth) rows — the deployment
            # shape for a REAL network crawl. Two-phase like the scan
            # fallback: a network response has no stable item identity for
            # the retry-safe tee, so the processed checkpoint is a normal
            # write_parquet and the link columns re-read from it.
            from abwcf_ray.stages.transport import TransportFetchStage

            sel_rows = pa.table(
                {
                    "url": pa.array(sel_df["url"], pa.string()),
                    "depth": pa.array(
                        sel_df["depth"].to_numpy().astype(np.int32),
                        pa.int32(),
                    ),
                }
            )
            lo_c, hi_c = cfg.fetch_transport_concurrency
            n_blocks = max(
                int(lo_c), min(64, sel_rows.num_rows // max(1, cfg.fetch_transport_batch_size) + 1)
            )
            fetched = rd.from_arrow(sel_rows).repartition(n_blocks).map_batches(
                TransportFetchStage,
                fn_constructor_args=(cfg.fetch_transport,),
                batch_format="pyarrow",
                concurrency=(int(lo_c), int(max_fetchers or hi_c)),
                batch_size=cfg.fetch_transport_batch_size,
            )
            fetched.map_batches(
                process_fetched, batch_format="pyarrow"
            ).write_parquet(str(wdir / "processed"), compression="zstd")
            if not any((wdir / "processed").glob("*.parquet")):
                # every fetch failed/missed: keep the checkpoint readable
                from abwcf_ray.stages.fetch import empty_fetched_table

                pq.write_table(
                    process_fetched(empty_fetched_table()),
                    wdir / "processed" / "part-empty.parquet",
                )
            links_ds = rd.read_parquet(
                str(wdir / "processed"), columns=["links", "child_depth"]
            )
        elif use_pruned:
            from abwcf_ray.stages.fetch import make_fetch_process_tee

            items = plan_pruned_fetch(hashed_dir, sel_sorted)
            metrics["fetch_row_groups"] = int(sum(len(i["rgs"]) for i in items))
            metrics["fetch_tasks"] = len(items)
            if items:
                links_ds = rd.from_items(
                    items, override_num_blocks=len(items)
                ).map_batches(
                    make_fetch_process_tee(
                        sel_ref,
                        process_fetched,
                        str(wdir / "processed"),
                        cfg.max_content_length,
                    ),
                    batch_format="pyarrow",
                    **({"concurrency": max_fetchers} if max_fetchers else {}),
                )
            else:
                # zero-item wave: keep the checkpoint readable (resume and
                # the oracle read the processed dir) — one empty part in the
                # processed schema, as the two-phase path produced
                from abwcf_ray.stages.fetch import empty_fetched_table

                pq.write_table(
                    process_fetched(empty_fetched_table()),
                    wdir / "processed" / "part-empty.parquet",
                )
                links_ds = rd.from_arrow(
                    pa.table(
                        {
                            "links": pa.array([], pa.list_(pa.string())),
                            "child_depth": pa.array([], pa.int32()),
                        }
                    )
                )
        else:
            # scan fallback (corpus without the hashed layout): keep the
            # two-phase shape — scan blocks have no stable item identity,
            # so a side-effect tee could duplicate parts on task retry.
            # NOTE: no min_rows_per_file — Ray's write-coalescing buffers
            # whole text+links blocks row-wise (measured 13x slowdown).
            fetched = corpus_ds.map_batches(
                make_fetch_scan(sel_ref, cfg.max_content_length),
                batch_format="pyarrow",
                **({"concurrency": max_fetchers} if max_fetchers else {}),
            )
            fetched.map_batches(
                process_fetched, batch_format="pyarrow"
            ).write_parquet(str(wdir / "processed"), compression="zstd")
            links_ds = rd.read_parquet(
                str(wdir / "processed"), columns=["links", "child_depth"]
            )

        _mark("fetch_prep")  # sel hashing + broadcast puts + pruned plan
        # ---- candidate pipeline (B1 -> B4 -> B5 -> C1 -> F1 -> B7) ------
        # Wave-dedup + seen-filter run as a TWO-PHASE shard-actor protocol
        # instead of a groupby(url) all-to-all: the materialize() barrier
        # completes every `propose` (min-depth per url) before any `claim`
        # (first-wins arbitration + seen registration) runs — the same
        # single-writer-per-url mechanism as the reference's sharded
        # PageManager entities. The materialized set is politeness-bounded
        # (links of this wave's fetches, html long since dropped). The
        # barrier also guarantees every processed-checkpoint part from the
        # fused tee is on disk before the wave's metrics read them.
        cand_pre = (
            links_ds.map_batches(explode_links, batch_format="pyarrow")
            .map_batches(normalize, batch_format="pyarrow")
            .map_batches(scope, batch_format="pyarrow")
        )
        if bucketed:
            cand_pre = apply_robots_filter_bucketed(
                cand_pre, bucket_refs, cfg.hosts_bucket_bits, strict=False
            )
        else:
            cand_pre = cand_pre.map_batches(
                make_lenient_robots_filter(hosts_ref), batch_format="pyarrow"
            )
        cand_m = cand_pre.map_batches(
            # run_key includes the shard-POOL token: a resumed run re-runs
            # the same (wdir, wave) with a fresh pool, and stale RPC-skip
            # cache entries in surviving workers would lose candidates
            # (see SeenSet.cache_token)
            make_propose(
                seen,
                wave,
                run_key=f"{wdir}:{seen.cache_token()}",
                cache_size=cfg.prededup_cache_size,
            ),
            batch_format="pyarrow",
        ).materialize()
        _mark("fetch_candidates")

        # ---- claim DISPATCH (barrier deferred — verdict r4 #2) ----------
        # The claim chunk tasks run on workers; everything the driver does
        # until the ray.get below (metrics flags read, novel filter, flips
        # write, stats string) depends only on the materialized candidate
        # set and the processed checkpoint, so it overlaps the claim
        # instead of serializing behind it.
        delta_dir = wdir / "delta"
        delta_dir.mkdir(parents=True, exist_ok=True)
        block_refs = cand_m.to_arrow_refs()
        n_cpu = int(ray.cluster_resources().get("CPU", 8))
        n_chunks = max(1, min(len(block_refs), 2 * n_cpu))
        claim_refs = [
            _claim_chunk.remote(
                tok, seen, wave, host_accum, cfg, str(delta_dir),
                *block_refs[tok::n_chunks],
            )
            for tok in range(n_chunks)
        ]

        # ---- wave metrics from the processed checkpoint (tiny columns) --
        import pyarrow.dataset as pads

        proc_files = sorted(str(p) for p in (wdir / "processed").glob("*.parquet"))
        if proc_files:
            flags = pads.dataset(proc_files).to_table(
                columns=["fetch_status", "is_html", "length_exceeded"]
            )
        else:
            flags = pa.table(
                {
                    "fetch_status": pa.array([], pa.int32()),
                    "is_html": pa.array([], pa.bool_()),
                    "length_exceeded": pa.array([], pa.bool_()),
                }
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

        # ---- cross-wave novel-content filter (optional, stages/novel.py) -
        if content_seen is not None:
            from abwcf_ray.stages.novel import novel_extracted

            _, n_novel = novel_extracted(
                wdir / "processed", wdir / "novel", content_seen, wave
            )
            metrics["n_novel"] = n_novel
            _mark("novel_filter")
        # ---- frontier delta checkpoint (O(changed), never a rewrite) ----
        # new Discovered rows append as this wave's delta; status flips
        # (selected -> Processed, rejected -> Disallowed; both politeness-
        # bounded) append as a tiny flips file. The frontier itself is
        # untouched — the reference analog is the batched
        # ``UPDATE pages SET status`` (SlickPageRepository.scala:37-51),
        # not a table rewrite.
        # Claim phase (dispatched above, overlapping the driver work since
        # _mark("fetch_candidates")): materialized blocks coalesce into ~2
        # tasks per CPU slot; each chunk claims, prioritizes, and writes
        # its own delta part under a token-derived name (retry-safe tee —
        # see _claim_chunk), so the claimed rows never cross back to a
        # second Dataset execution or the driver.
        flips_path = wdir / "flips.parquet"
        _write_flips(flips_path, sel_sorted, disallowed_hashes)
        # resolve the old-manifest fallback BEFORE this wave's delta enters
        # the chain (and possibly compacts into base) — computing it after
        # a compaction would double-count this wave's n_new
        if prev_frontier_rows is None:
            prev_frontier_rows = _parquet_rows(Path(chain.base)) + sum(
                _parquet_rows(d) for d in chain.deltas
            )
        try:  # per-stage Ray Data stats for the fused wave execution
            metrics["ray_stats"] = cand_m.stats()[:4000]
        except Exception:
            pass
        claim_counts = ray.get(claim_refs)
        if not any(delta_dir.glob("*.parquet")):
            # zero-claim wave: keep the dir readable in the chain union
            pq.write_table(FRONTIER_SCHEMA.empty_table(), delta_dir / "part-empty.parquet")
        new_host_counts = host_accum.drain()
        chain.add_wave(delta_dir, flips_path, sel_sorted, disallowed_hashes)
        _mark("frontier_write")

        # ---- host ledger update (exact arithmetic, no frontier rescan) --
        sel_counts = sel_df["host"].value_counts()
        host_ledger.apply(
            sel_counts.index.to_numpy(dtype=object), -sel_counts.to_numpy()
        )
        if disallowed_counts:
            host_ledger.apply(
                list(disallowed_counts),
                -np.fromiter(disallowed_counts.values(), np.int64),
            )
        if new_host_counts:
            host_ledger.apply(
                list(new_host_counts),
                np.fromiter(new_host_counts.values(), np.int64),
            )
        if host_ledger.has_negative():
            # defensive: arithmetic drift would starve a host of robots
            # prep forever — drop the ledger and rescan next wave
            log(f"[crawl] wave {wave}: host ledger went negative; rescanning")
            host_ledger = None
        else:
            host_ledger.prune()

        # periodic compaction: bound the chain length AND the broadcast
        # flips array (the only O(frontier) write, amortized over
        # frontier_compact_every waves; the flips-size trigger is a hard
        # byte bound — 10^7-page waves fill it long before the delta count)
        n_flips = len(chain.cum_processed) + len(chain.cum_disallowed)
        if (
            len(chain.deltas) >= cfg.frontier_compact_every
            or n_flips >= cfg.frontier_compact_max_flips
        ):
            _compact_frontier(chain, wdir / "frontier")
            _mark("frontier_compact")

        seen.checkpoint(wdir / "seen")
        if content_seen is not None:
            content_seen.checkpoint(wdir / "content_seen")
        _mark("seen_ckpt")
        total_fetched += n_selected
        if sel_write_ref is not None:
            ray.get(sel_write_ref)
        lineage = {
            "frontier_delta": _file_lineage(delta_dir),
            "processed": _file_lineage(wdir / "processed"),
            "selected": _file_lineage(wdir / "selected"),
        }
        if (wdir / "frontier").exists():
            lineage["frontier"] = _file_lineage(wdir / "frontier")
        n_new = sum(claim_counts)  # == lineage["frontier_delta"] rows (footer-checked in tests)
        n_frontier = prev_frontier_rows + n_new
        metrics.update(
            n_selected=n_selected,
            fetch_status=status_hist,
            n_extracted=n_extracted,
            n_new=n_new,
            n_frontier=n_frontier,
            total_fetched=total_fetched,
            seen_size=seen.size(),
            duration_s=round(time.perf_counter() - t0, 3),
            step_times=step_t,
            completed=True,
            files=lineage,
            frontier_chain=chain.manifest_entry(),
        )
        prev_frontier_rows = n_frontier
        (wdir / "manifest.json").write_text(json.dumps(metrics))
        summary.per_wave.append(metrics)
        summary.waves = wave + 1
        log(
            f"[crawl] wave {wave}: eligible={metrics['n_eligible']} "
            f"selected={n_selected} new={n_new} "
            f"frontier={n_frontier} ({metrics['duration_s']}s)"
        )
        if total_fetched >= cfg.max_pages:
            log(f"[crawl] page budget reached ({total_fetched})")
            break

    summary.total_fetched = total_fetched
    summary.final_frontier_rows = int(prev_frontier_rows or 0)
    summary.seen_size = seen.size()
    seen.shutdown()
    if content_seen is not None:
        content_seen.shutdown()
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
    parser.add_argument(
        "--transport",
        choices=["fused", "corpus", "http"],
        default="fused",
        help="fetch path: 'fused' (default pruned tee), 'corpus' (the "
        "injectable CorpusTransport actor pool — same results, exercises "
        "the FetchTransport seam), 'http' (real network via HTTPTransport; "
        "urls must be reachable)",
    )
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
    if args.transport != "fused":
        from dataclasses import replace as _dc_replace

        from abwcf_ray.stages.transport import CorpusTransport, HTTPTransport

        if args.transport == "corpus":
            hashed = corpus.hashed_dir
            cap = cfg.max_content_length
            factory = lambda: CorpusTransport(hashed, max_content_length=cap)  # noqa: E731
        else:
            cap = cfg.max_content_length
            factory = lambda: HTTPTransport(max_content_length=cap)  # noqa: E731
        cfg = _dc_replace(cfg, fetch_transport=factory)
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
