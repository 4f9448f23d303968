"""Per-group distinct counting: exact, and HLL-sketched.

``COUNT(DISTINCT item) GROUP BY group`` is the per-entity cardinality
aggregate (distinct terms per host, distinct users per page, distinct
URLs per domain). Two regimes:

- **exact** (``group_distinct_count``): per-batch (group, item) pair
  dedupe (the combiner), ONE keyed exchange of 8-byte pair hashes —
  ``hash64`` item identity, the ngram_dedup / decontaminate collision-
  soundness contract — partitioned by the PAIR hash so every pair lands
  in exactly one partition and per-partition distinct counts ADD; a
  second, combo-bounded keyed merge sums the per-partition partials per
  group. Exchange O(distinct pairs), never O(rows), nothing on the
  driver.
- **sketched** (``group_distinct_hll``): one HyperLogLog register vector
  (2^p bytes) per (block, group), merged per group by elementwise max —
  the exchange carries O(groups-per-block) fixed-size vectors no matter
  the item cardinality. Standard error ≈ 1.04/√(2^p) per group. Same
  rank arithmetic as the global HLL (stages/sketch.hll_distinct_count).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import keyed_hash_agg


def _arrow_type_of(col) -> pa.DataType:
    t = col.type
    return pa.string() if pa.types.is_large_string(t) else t


def _drop_null_items(pdf: pd.DataFrame, item_col: str) -> pd.DataFrame:
    """SQL COUNT(DISTINCT) excludes NULLs — drop them before hashing
    (a numeric NaN would astype to an undefined int64 sentinel and a
    string None would collide with the literal 'None')."""
    return pdf[pdf[item_col].notna()]


def _col_u64(s: pd.Series) -> np.ndarray:
    if s.dtype == object or pd.api.types.is_string_dtype(s):
        return hash64(s.astype(str).tolist()) if len(s) else np.zeros(0, np.uint64)
    return s.to_numpy().astype(np.int64).astype(np.uint64)


_MIX = np.uint64(0x9E3779B97F4A7C15)


def group_distinct_count(ds, *, group_col: str, item_col: str,
                         partitions: int | None = None):
    """Exact per-group distinct-item count over an exploded (group, item)
    dataset. Returns a Dataset (group_col, distinct:int64)."""

    def pairs(t: pa.Table) -> pa.Table:
        pdf = _drop_null_items(
            t.select([group_col, item_col]).to_pandas(), item_col
        )
        if not len(pdf):
            # explicitly typed empty: from_pandas would infer null-typed
            # group column and break schema unification downstream
            return pa.table(
                {
                    group_col: pa.array(
                        [], _arrow_type_of(t.column(group_col))
                    ),
                    "_ih": pa.array([], pa.int64()),
                }
            )
        ih = pd.Series(_col_u64(pdf[item_col]).astype(np.int64), name="_ih")
        sub = pd.DataFrame(
            {group_col: pdf[group_col].reset_index(drop=True), "_ih": ih.reset_index(drop=True)}
        )
        sub = sub.drop_duplicates()
        return pa.Table.from_pandas(sub, preserve_index=False)

    def pair_key(b: pa.Table) -> np.ndarray:
        g = _col_u64(b.column(group_col).to_pandas())
        i = b.column("_ih").to_numpy(zero_copy_only=False).astype(np.uint64)
        return g * _MIX ^ i

    def count_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        out = d.groupby(group_col, as_index=False, sort=False).agg(
            n=("_ih", "size")
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = keyed_hash_agg(
        ds.map_batches(pairs, batch_format="pyarrow"),
        pair_key,
        count_partial,
        partitions=partitions,
    )

    def sum_groups(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(group_col, as_index=False, sort=False).agg(
            distinct=("n", "sum")
        )
        out["distinct"] = out["distinct"].astype(np.int64)
        return out

    return keyed_hash_agg(
        partials,
        lambda b: _col_u64(b.column(group_col).to_pandas()),
        sum_groups,
        partitions=partitions,
    )


def _hll_ranks(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash — same arithmetic as
    sketch.hll_distinct_count (sentinel bit bounds the rank; float64 log2
    recovers the leading-one position exactly at these magnitudes)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64(1 << (p - 1))
    f = np.floor(np.log2(rest.astype(np.float64)))
    return idx, (63 - f).astype(np.uint8) + 1


def _hll_estimate(reg: np.ndarray) -> float:
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** (-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def group_distinct_hll(ds, *, group_col: str, item_col: str, p: int = 12,
                       partitions: int | None = None):
    """Per-group HLL distinct estimate over an exploded (group, item)
    dataset. Returns a Dataset (group_col, distinct_est:float64). The
    exchange carries one 2^p-byte register vector per (block, group)."""
    m = 1 << p

    def registers(t: pa.Table) -> pa.Table:
        pdf = _drop_null_items(
            t.select([group_col, item_col]).to_pandas(), item_col
        )
        if not len(pdf):
            return pa.table(
                {
                    group_col: pa.array(
                        [], _arrow_type_of(t.column(group_col))
                    ),
                    "reg": pa.array([], pa.binary()),
                }
            )
        h = _col_u64(pdf[item_col])
        idx, rank = _hll_ranks(h, p) if len(h) else (None, None)
        groups, regs = [], []
        if len(pdf):
            codes, uniques = pd.factorize(pdf[group_col].to_numpy())
            for gi, gval in enumerate(uniques):
                sel = codes == gi
                reg = np.zeros(m, np.uint8)
                np.maximum.at(reg, idx[sel], rank[sel])
                groups.append(gval)
                regs.append(reg.tobytes())
        return pa.table(
            {group_col: pa.array(groups), "reg": pa.array(regs, pa.binary())}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for gval, sub in g.groupby(group_col, sort=False):
            reg = np.zeros(m, np.uint8)
            for b in sub["reg"]:
                reg = np.maximum(reg, np.frombuffer(b, np.uint8))
            rows.append((gval, _hll_estimate(reg)))
        return pd.DataFrame(rows, columns=[group_col, "distinct_est"])

    return keyed_hash_agg(
        ds.map_batches(registers, batch_format="pyarrow"),
        lambda b: _col_u64(b.column(group_col).to_pandas()),
        merge,
        partitions=partitions,
    )
