"""Mergeable quantile sketch (deterministic KLL-style compactor stack).

int_quantiles (stages/sketch.py) is exact but exchanges O(distinct
values) — the right call for measurement-like keys with tiny domains.
For UNBOUNDED integer domains (timestamps, byte offsets, scaled floats)
the classic answer is a compactor-stack quantile sketch (Karnin, Lang &
Liberty 2016 shape): each block reduces to a fixed-capacity summary,
summaries merge associatively, and the exchange carries
O(k · log(n/k)) items per block no matter the value domain.

This implementation uses DETERMINISTIC alternating-parity compaction
(the MRL-style variant of KLL): a full level sorts, keeps every other
item — the survivor parity alternating per level across compactions —
and promotes survivors with doubled weight. Determinism trades away
KLL's randomized √log improvement but keeps the mergeable-summary
contract and a bounded worst-case rank error, and makes single-layout
runs reproducible. Like every compaction sketch the RESULT depends on
merge order, so output is layout-dependent (rows-only query); the
degenerate sibling — capacity ≥ n means no compaction ever fires, the
sketch holds the full multiset, and quantiles are EXACT and
layout-invariant — carries a DuckDB quantile_disc value oracle over the
full machinery (the minhash_dedup_exact / knn_ivf_exact pattern).

Distributed shape: per-block sketches serialize as (level, v) int rows
(fixed-size partials, the MG/HLL idiom), merge on the driver via one
stack merge. Quantile rule matches DuckDB quantile_disc on the weighted
multiset: value at cumulative weight >= ceil(q · N).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class _Sketch:
    """Compactor stack: ``levels[i]`` holds int64 items of weight 2^i,
    each level UNSORTED until compaction. ``parity[i]`` alternates the
    survivor offset per level."""

    def __init__(self, k: int):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.int64)]
        self.parity: list[int] = [0]
        self.n = 0

    def add(self, v: np.ndarray) -> None:
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v.astype(np.int64)])
        self._compress()

    def merge(self, other: "_Sketch") -> None:
        self.n += other.n
        for i, lv in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append(np.empty(0, np.int64))
                self.parity.append(0)
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                buf = np.sort(self.levels[i], kind="mergesort")
                off = self.parity[i]
                self.parity[i] ^= 1
                # only an even count compacts (weight is conserved exactly:
                # survivors carry doubled weight); an odd straggler stays
                even = len(buf) - (len(buf) % 2)
                survivors = buf[:even][off::2]
                self.levels[i] = buf[even:]
                if len(self.levels) <= i + 1:
                    self.levels.append(np.empty(0, np.int64))
                    self.parity.append(0)
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], survivors]
                )
            i += 1

    def to_rows(self) -> tuple[np.ndarray, np.ndarray]:
        lv = np.concatenate(
            [np.full(len(x), i, np.int8) for i, x in enumerate(self.levels)]
        ) if any(len(x) for x in self.levels) else np.empty(0, np.int8)
        v = (
            np.concatenate([x for x in self.levels])
            if any(len(x) for x in self.levels)
            else np.empty(0, np.int64)
        )
        return lv, v

    @classmethod
    def from_rows(cls, k: int, level: np.ndarray, v: np.ndarray,
                  n: int) -> "_Sketch":
        s = cls(k)
        s.n = n
        depth = int(level.max()) + 1 if len(level) else 1
        s.levels = [v[level == i].astype(np.int64) for i in range(depth)]
        s.parity = [0] * depth
        return s

    def quantiles(self, qs: list) -> pd.DataFrame:
        """DuckDB quantile_disc rule on the weighted multiset: the item at
        cumulative weight >= max(1, ceil(q*N))."""
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 1 << i, np.int64))
        out_q = [int(round(q * 100)) for q in qs]
        if not items:
            return pd.DataFrame(
                {"q_pct": np.array(out_q, np.int64),
                 "value": np.zeros(len(qs), np.int64)}
            )
        v = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="mergesort")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        total = int(cum[-1])
        vals = []
        for q in qs:
            rank = max(1, int(np.ceil(q * total)))
            vals.append(int(v[np.searchsorted(cum, rank, side="left")]))
        return pd.DataFrame(
            {"q_pct": np.array(out_q, np.int64),
             "value": np.array(vals, np.int64)}
        )


def kll_quantiles(ds, *, col: str, qs: list, k: int = 4096) -> pd.DataFrame:
    """Quantiles of an integer column via per-block compactor sketches.
    Returns (q_pct, value). Exchange: O(k·log(block/k)) rows per block.
    With ``k`` >= the total row count the sketch never compacts and the
    result equals exact quantile_disc (the degenerate-oracle regime)."""

    def sk(batch: pa.Table) -> pa.Table:
        s = _Sketch(k)
        s.add(batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64))
        lv, v = s.to_rows()
        # ONE row per sketch (binary payloads) — concatenation-safe when
        # Ray packs several batch outputs into one block
        return pa.table(
            {
                "n": pa.array([s.n], pa.int64()),
                "levels": pa.array([lv.tobytes()], pa.binary()),
                "vals": pa.array([v.tobytes()], pa.binary()),
            }
        )

    import ray

    final = _Sketch(k)
    for t in ray.get(ds.map_batches(sk, batch_format="pyarrow").to_arrow_refs()):
        for row in t.to_pylist():
            final.merge(
                _Sketch.from_rows(
                    k,
                    np.frombuffer(row["levels"], np.int8),
                    np.frombuffer(row["vals"], np.int64),
                    int(row["n"]),
                )
            )
    return final.quantiles(qs)
