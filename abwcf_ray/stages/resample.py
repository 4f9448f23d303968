"""Time-series resampling with forward fill — regularize an event stream
onto a fixed bucket grid, carrying the last observation across gaps.

The monitoring/feature-engineering primitive over crawl telemetry or user
events: "hourly value per user, gaps filled from the last reading". Two
semantics decisions, both mirrored exactly by the SQL oracle:

- the representative of an observed (key, bucket) is the LAST event in
  the bucket, ordered by (ts, tie_col) — deterministic under any block
  layout;
- the grid per key spans [min observed bucket, max observed bucket] of
  THAT key (no global alignment), so output size is politeness-bounded
  by actual per-key activity spans, never by the corpus time range.

Scale shape: one map-side combiner pass (per-batch last-per-(key,bucket)
— collapses dense streams before the wire) + ONE hash(key) exchange
(``keyed_hash_agg``; the native high-cardinality groupby is 22× slower,
see stages/dedup.py). Each partition settles its keys' global
last-per-bucket and expands the gap grid fully vectorized: aranges are
concatenated with the offset trick and the fill indices come from one
``searchsorted`` over the combined (key, bucket) domain — no per-key
Python loop. The expansion happens AFTER the exchange, so gap rows never
cross the wire.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import _int_pkey, keyed_hash_agg

RESAMPLE_PARTITIONS = 64


def _last_per_group(
    key: np.ndarray, bucket: np.ndarray, ts: np.ndarray, tie: np.ndarray
) -> np.ndarray:
    """Indices of the max-(ts, tie) row of each (key, bucket) group."""
    order = np.lexsort((tie, ts, bucket, key))
    k, b = key[order], bucket[order]
    last = np.r_[(k[1:] != k[:-1]) | (b[1:] != b[:-1]), True]
    return order[last]


def _make_combine(key_col, ts_col, val_col, tie_col, span_us):
    """Map-side combiner shared by the resample variants: per-batch
    last-per-(key, bucket) representative — collapses dense streams
    before the keyed exchange."""

    def combine(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            batch.column(ts_col)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        tie = batch.column(tie_col).to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch.column(val_col).to_numpy(zero_copy_only=False)
        bucket = ts // span_us
        idx = _last_per_group(key, bucket, ts, tie)
        return pa.table(
            {
                "key": pa.array(key[idx], pa.int64()),
                "bucket": pa.array(bucket[idx], pa.int64()),
                "ts": pa.array(ts[idx], pa.int64()),
                "tie": pa.array(tie[idx], pa.int64()),
                "val": pa.array(val[idx], pa.float64()),
            }
        )

    return combine


def _settle_and_grid(g: pd.DataFrame):
    """Settle a partition's global last-per-(key, bucket) observations
    and build each key's dense bucket grid. Returns
    ``(okey, obkt, oval, grid)`` where ``grid`` is None on an empty
    partition, else ``(row_key, gbkt, fi, obs_mask)``: the grid rows,
    the index of the last observation at or before each grid point, and
    whether the grid point was itself observed."""
    key = g["key"].to_numpy()
    bucket = g["bucket"].to_numpy()
    idx = _last_per_group(key, bucket, g["ts"].to_numpy(), g["tie"].to_numpy())
    # idx walks groups in (key, bucket) lexicographic order (it picks
    # along the lexsort axis), so these arrays are (key, bucket)-sorted
    okey, obkt, oval = key[idx], bucket[idx], g["val"].to_numpy()[idx]
    if len(okey) == 0:
        return okey, obkt, oval, None
    # per-key span [first observed bucket, last observed bucket]
    first_i = np.flatnonzero(np.r_[True, okey[1:] != okey[:-1]])
    last_i = np.r_[first_i[1:] - 1, len(okey) - 1]
    b0, b1 = obkt[first_i], obkt[last_i]
    lens = b1 - b0 + 1
    total = int(lens.sum())
    # concatenated aranges: arange(total) minus each key's start offset
    offs = np.cumsum(lens) - lens
    row_key = np.repeat(okey[first_i], lens)
    gbkt = np.arange(total, dtype=np.int64) - np.repeat(offs - b0, lens)
    # fill index = last observed (key, bucket) <= each grid point: one
    # searchsorted over a monotone (key rank, bucket offset) composite
    # (key ranks and bucket offsets both < 2^32 — ranks by construction,
    # offsets because a span of 2^32 hourly buckets is ~490k years)
    krank = np.cumsum(np.r_[True, okey[1:] != okey[:-1]]) - 1
    bmin = obkt.min()
    if int(obkt.max() - bmin) >= (1 << 32):
        raise ValueError(
            "resample bucket span exceeds 2^32 buckets in one partition "
            "(fine-grained span_us over a long range): the 32-bit "
            "composite packing would silently corrupt fill indices — "
            "use a coarser span_us or pre-split the time range"
        )
    comp_obs = (krank.astype(np.uint64) << np.uint64(32)) | (
        obkt - bmin
    ).astype(np.uint64)
    grank = np.repeat(np.arange(len(first_i), dtype=np.uint64), lens)
    comp_grid = (grank << np.uint64(32)) | (gbkt - bmin).astype(np.uint64)
    fi = np.searchsorted(comp_obs, comp_grid, side="right") - 1
    obs_mask = comp_obs[fi] == comp_grid
    return okey, obkt, oval, (row_key, gbkt, fi, obs_mask)


def resample_ffill(
    ds,
    *,
    key_col: str,
    ts_col: str,
    val_col: str,
    tie_col: str,
    span_us: int,
    partitions: int = RESAMPLE_PARTITIONS,
):
    """Resample ``ds`` onto ``span_us``-wide buckets per ``key_col`` and
    forward-fill gaps. Returns a Dataset with columns ``(key_col, bucket,
    value, observed)``: one row per bucket in each key's observed span,
    ``value`` = last observation at or before the bucket (IEEE bits
    untouched — the fill only moves values, never recomputes them),
    ``observed`` = 1 where the bucket had an event."""
    combine = _make_combine(key_col, ts_col, val_col, tie_col, span_us)

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        okey, obkt, oval, grid = _settle_and_grid(g)
        if grid is None:
            return pd.DataFrame(
                {
                    key_col: okey,
                    "bucket": obkt,
                    "value": oval,
                    "observed": np.empty(0, np.int64),
                }
            )
        row_key, gbkt, fi, obs_mask = grid
        return pd.DataFrame(
            {
                key_col: row_key,
                "bucket": gbkt,
                "value": oval[fi],
                "observed": obs_mask.astype(np.int64),
            }
        )

    partials = ds.map_batches(combine, batch_format="pyarrow")
    return keyed_hash_agg(
        partials,
        lambda b: b.column("key").to_numpy(zero_copy_only=False),
        expand,
        partitions=partitions,
    )


def resample_interp(
    ds,
    *,
    key_col: str,
    ts_col: str,
    val_col: str,
    tie_col: str,
    span_us: int,
    partitions: int = RESAMPLE_PARTITIONS,
):
    """Resample onto ``span_us`` buckets per key and LINEARLY INTERPOLATE
    gaps between observed buckets (same grid/representative semantics as
    :func:`resample_ffill`: last event per observed bucket, grid spans
    each key's own [first, last] observed bucket — so every unobserved
    grid point has an observation on BOTH sides within its key).

    Float discipline: observed buckets keep their value's IEEE bits
    untouched; each gap value is the FIXED four-op expression

        v = v0 + ((v1 − v0) · (g − b0)) / (b1 − b0)

    over the neighbor observations (b0, v0), (b1, v1) — a SQL oracle
    reproduces the bits with the identical expression over LEAD() of the
    observed rows.
    """
    combine = _make_combine(key_col, ts_col, val_col, tie_col, span_us)

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        okey, obkt, oval, grid = _settle_and_grid(g)
        if grid is None:
            return pd.DataFrame(
                {
                    key_col: okey,
                    "bucket": obkt,
                    "value": oval,
                    "observed": np.empty(0, np.int64),
                }
            )
        row_key, gbkt, fi, obs_mask = grid
        # next observation: fi+1 stays inside the key for every
        # unobserved grid point (each key's grid ENDS at an observed
        # bucket); clamp only to keep the gather in-bounds where masked
        ni = np.minimum(fi + 1, len(obkt) - 1)
        v0, v1 = oval[fi], oval[ni]
        gd = (gbkt - obkt[fi]).astype(np.float64)
        bd = (obkt[ni] - obkt[fi]).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            interp = v0 + ((v1 - v0) * gd) / bd
        return pd.DataFrame(
            {
                key_col: row_key,
                "bucket": gbkt,
                "value": np.where(obs_mask, v0, interp),
                "observed": obs_mask.astype(np.int64),
            }
        )

    partials = ds.map_batches(combine, batch_format="pyarrow")
    return keyed_hash_agg(
        partials,
        lambda b: b.column("key").to_numpy(zero_copy_only=False),
        expand,
        partitions=partitions,
    )
