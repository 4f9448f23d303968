"""Sharded exact URL-seen set.

The reference guarantees exact dedup by cluster sharding: one ``PageManager``
entity per URL swallows duplicate ``Discover`` messages
(PageManager.scala:74-157, entity id = url at PageManager.scala:19,24). The
rebuild holds the same state as a pool of ``SeenShard`` Ray actors routed by
``hash64(url) % num_shards`` — the hash space replaces the entity-id hash
ring, and shards store 64-bit url hashes, not strings (10^10 urls -> ~80 GB
cluster-wide, ~300 MB/shard at 256 shards).

Retry-safety: membership is **wave-versioned** (``hash -> wave_added``).
The filter stage probes ``contains(hashes, before_wave=n)`` — only urls
added in waves < n count as seen — and the add stage registers
``add(hashes, wave=n)`` with setdefault semantics. A Ray task that is
retried after its own adds took effect therefore reproduces its original
output (its urls were added at wave n, which the probe ignores), and
re-adding is a no-op. Within-wave duplicates are arbitrated by the shards
themselves via the two-phase propose/claim protocol below, mirroring
PageManager.scala:107 where a Discover for a known url is swallowed.

Checkpoint: each shard persists its own parquet file (parallel, one file per
shard) so resume re-creates the pool without rescanning the frontier.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from abwcf_ray.functions.hashing import hash64


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the seen set. ``num_cpus=0``: membership ops are tiny and
    must not starve the fetch/parse pools of scheduling slots.

    Beyond membership, shards arbitrate within-wave duplicate discoveries —
    the rebuild of the reference's per-URL PageManager entity swallowing
    duplicate Discover messages (PageManager.scala:107): a two-phase
    ``propose`` (min-depth merge; commutative+idempotent) then ``claim``
    (first-token-wins per url; deterministic because competing claimants
    carry identical rows) replaces a ``groupby(url)`` all-to-all shuffle of
    the candidate stream."""

    def __init__(self) -> None:
        self._waves: dict[int, int] = {}
        self._cur_wave: int | None = None
        self._wave_min: dict[int, int] = {}
        self._claims: dict[int, int] = {}

    def contains(self, hashes: np.ndarray, before_wave: int) -> np.ndarray:
        w = self._waves
        return np.fromiter(
            (w.get(int(h), before_wave) < before_wave for h in hashes),
            dtype=bool,
            count=len(hashes),
        )

    def add(self, hashes: np.ndarray, wave: int) -> int:
        before = len(self._waves)
        for h in hashes:
            self._waves.setdefault(int(h), wave)
        return len(self._waves) - before

    # -- two-phase within-wave dedup (F1) ---------------------------------
    def _begin_wave(self, wave: int) -> None:
        if self._cur_wave != wave:
            self._cur_wave = wave
            self._wave_min = {}
            self._claims = {}

    def propose(self, wave: int, hashes: np.ndarray, depths: np.ndarray) -> None:
        """Min-depth merge per url hash (canonical first-discovery = lowest
        depth). Commutative and idempotent -> retry-safe in any order."""
        self._begin_wave(wave)
        wm = self._wave_min
        for h, d in zip(hashes, depths):
            h, d = int(h), int(d)
            m = wm.get(h)
            if m is None or d < m:
                wm[h] = d

    def claim(
        self, wave: int, hashes: np.ndarray, depths: np.ndarray, token: int
    ) -> np.ndarray:
        """Mask of rows this claimant wins: not seen before this wave, depth
        equals the proposed minimum, and first claim token wins. Tokens
        must be unique per claimant block and stable across retries (the
        driver passes materialized-block indices), so a retried task
        reproduces its mask and two distinct blocks can never both win.
        Winners are registered as seen."""
        self._begin_wave(wave)
        out = np.zeros(len(hashes), dtype=bool)
        waves, wm, claims = self._waves, self._wave_min, self._claims
        taken_this_call: set[int] = set()  # within-batch duplicate guard
        for i, (h, d) in enumerate(zip(hashes, depths)):
            h, d = int(h), int(d)
            if h in taken_this_call:
                continue
            if waves.get(h, wave) < wave:
                continue  # seen in an earlier wave
            if wm.get(h) != d:
                continue  # a lower-depth discovery wins this wave
            if claims.setdefault(h, token) == token:
                waves.setdefault(h, wave)
                taken_this_call.add(h)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self._waves)

    def checkpoint(self, path: str) -> int:
        items = sorted(self._waves.items())  # deterministic checkpoint bytes
        pq.write_table(
            pa.table(
                {
                    "url_hash": pa.array([h for h, _ in items], pa.uint64()),
                    "wave": pa.array([w for _, w in items], pa.int32()),
                }
            ),
            path,
        )
        return len(items)

    def restore(self, path: str) -> int:
        t = pq.read_table(path)
        self._waves = dict(
            zip(t.column("url_hash").to_pylist(), t.column("wave").to_pylist())
        )
        return len(self._waves)


@ray.remote(num_cpus=0)
class HashAccumulator:
    """Side-channel collector for per-wave reject sets (strict robots):
    map tasks add hashes synchronously during their pass; the driver drains
    once the pass completes. Set union -> idempotent under task retries."""

    def __init__(self) -> None:
        self._set: set[int] = set()

    def add(self, hashes: np.ndarray) -> None:
        self._set.update(int(h) for h in hashes)

    def drain(self) -> np.ndarray:
        arr = np.fromiter(self._set, dtype=np.uint64, count=len(self._set))
        arr.sort()
        self._set = set()
        return arr


@ray.remote(num_cpus=0)
class HostSetAccumulator:
    """Collects the distinct hosts of rows that will be Discovered in the
    NEXT wave's frontier, as a side-channel of the frontier-write pass —
    saving the next wave a full frontier scan for its host histogram.
    Set union -> idempotent under task retries."""

    def __init__(self) -> None:
        self._hosts: set[str] = set()

    def add(self, hosts: list[str]) -> None:
        self._hosts.update(hosts)

    def drain(self) -> list[str]:
        out = sorted(self._hosts)
        self._hosts = set()
        return out


class SeenSet:
    """Driver-side handle over the shard pool. The handle (actor refs +
    shard count) is cheap to serialize into ``map_batches`` closures."""

    def __init__(self, num_shards: int):
        self.num_shards = num_shards
        self.shards = [SeenShard.remote() for _ in range(num_shards)]

    # -- routing ----------------------------------------------------------
    def _route(self, hashes: np.ndarray) -> list[np.ndarray]:
        shard_ids = hashes % np.uint64(self.num_shards)
        return [np.flatnonzero(shard_ids == s) for s in range(self.num_shards)]

    def contains(self, hashes: np.ndarray, before_wave: int) -> np.ndarray:
        """Membership mask (urls added in waves < before_wave); callable from
        the driver or from inside a Ray task."""
        out = np.zeros(len(hashes), dtype=bool)
        idx = self._route(hashes)
        refs = [
            self.shards[s].contains.remote(hashes[ix], before_wave)
            for s, ix in enumerate(idx)
            if len(ix)
        ]
        live = [ix for ix in idx if len(ix)]
        for ix, mask in zip(live, ray.get(refs)):
            out[ix] = mask
        return out

    def add(self, hashes: np.ndarray, wave: int) -> None:
        idx = self._route(hashes)
        ray.get(
            [
                self.shards[s].add.remote(hashes[ix], wave)
                for s, ix in enumerate(idx)
                if len(ix)
            ]
        )

    def add_urls(self, urls, wave: int) -> None:
        self.add(hash64(urls), wave)

    def contains_urls(self, urls, before_wave: int) -> np.ndarray:
        return self.contains(hash64(urls), before_wave)

    def propose(self, hashes: np.ndarray, depths: np.ndarray, wave: int) -> None:
        idx = self._route(hashes)
        ray.get(
            [
                self.shards[s].propose.remote(wave, hashes[ix], depths[ix])
                for s, ix in enumerate(idx)
                if len(ix)
            ]
        )

    def claim(
        self, hashes: np.ndarray, depths: np.ndarray, wave: int, token: int
    ) -> np.ndarray:
        out = np.zeros(len(hashes), dtype=bool)
        idx = self._route(hashes)
        refs = [
            self.shards[s].claim.remote(wave, hashes[ix], depths[ix], token)
            for s, ix in enumerate(idx)
            if len(ix)
        ]
        live = [ix for ix in idx if len(ix)]
        for ix, mask in zip(live, ray.get(refs)):
            out[ix] = mask
        return out

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    # -- checkpoint / resume ---------------------------------------------
    @staticmethod
    def _hash_impl() -> str:
        try:
            import polars

            return f"polars-{polars.__version__}"
        except ImportError:  # pragma: no cover
            return "fnv1a64"

    def checkpoint(self, ckpt_dir: str | Path) -> None:
        d = Path(ckpt_dir)
        d.mkdir(parents=True, exist_ok=True)
        # the checkpoint stores HASHES; membership after restore compares
        # them against freshly computed ones, so the hash implementation
        # must be identical across the checkpoint boundary
        (d / "hash_impl.json").write_text(json.dumps({"impl": self._hash_impl()}))
        ray.get(
            [
                shard.checkpoint.remote(str(d / f"shard_{s:04d}.parquet"))
                for s, shard in enumerate(self.shards)
            ]
        )

    def restore(self, ckpt_dir: str | Path) -> None:
        d = Path(ckpt_dir)
        impl_file = d / "hash_impl.json"
        if impl_file.exists():
            stored = json.loads(impl_file.read_text())["impl"]
            if stored != self._hash_impl():
                raise RuntimeError(
                    f"seen-set checkpoint was written with hash impl "
                    f"{stored!r} but this process uses {self._hash_impl()!r}; "
                    "url-hash membership would silently miss — re-crawl or "
                    "pin the original library version"
                )
        ray.get(
            [
                shard.restore.remote(str(d / f"shard_{s:04d}.parquet"))
                for s, shard in enumerate(self.shards)
            ]
        )

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
