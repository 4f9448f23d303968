"""The frontier scheduler — per-host politeness top-k (SURVEY.md §2 D1-D3).

The reference holds a max-heap per host ordered by crawlPriority
(HostQueue.scala:69-84) and releases at most one page per crawl-delay window
(:128-141). In the wave model a wave of duration ``T`` lets host ``h``
contribute ``k_h = max(1, floor(T / crawl_delay_h))`` pages, in exact
per-host order ``(priority desc, url asc)`` (the url tiebreak replaces the
reference's nondeterministic arrival order; cross-host interleaving, random
in the reference via HostQueueRouter.scala:13, is canonicalized to the same
sort over the selected set).

This is THE wide shuffle of the pipeline, keyed by host. Host skew (a
heavy-hitter domain with millions of frontier rows) is handled by salting:
phase 1 groups by ``(host, salt)`` with ``salt = hash64(url) % S`` and takes
the per-salt top-k; phase 2 re-groups the ≤ S·k_h survivors by host and
takes the exact top-k — selection after the re-merge is exact because every
candidate that could be in the true top-k survives its salt group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from abwcf_ray.config import CrawlConfig
from abwcf_ray.functions.hashing import hash64

_SALT_SEED = 0x5A17


def budget_for_delay(delay_ms: int, wave_duration_s: float) -> int:
    """k_h (D2): fetches at t=0, delay, 2·delay, ... within the wave window;
    a delay longer than the wave still admits the t=0 fetch."""
    if delay_ms <= 0:
        return max(1, int(wave_duration_s * 1000))  # delay 0: bounded by wave ms
    return max(1, int(wave_duration_s * 1000) // delay_ms)


def _add_salt(batch, salt_buckets: int):
    import pyarrow as pa

    salts = hash64(batch.column("url").to_pylist(), seed=_SALT_SEED) % np.uint64(
        max(1, salt_buckets)
    )
    return batch.append_column("salt", pa.array(salts.astype(np.int32), pa.int32()))


def _topk_fn(delay_ref, wave_duration_s: float):
    """Per-group top-k: sort (priority desc, url asc), head(k_h)."""

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        host = group["host"].iloc[0]
        delays = ray.get(delay_ref)
        k = budget_for_delay(delays.get(host, 1000), wave_duration_s)
        out = group.sort_values(
            ["priority", "url"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return out

    return topk


def select_wave(
    eligible,
    delay_ref: "ray.ObjectRef",
    cfg: CrawlConfig,
):
    """eligible frontier rows (url, host, depth, priority, ...) -> the wave's
    fetch set with exact per-host top-k under the politeness budget."""
    cols = ["url", "host", "depth", "priority"]
    ds = eligible.select_columns(cols)
    topk = _topk_fn(delay_ref, cfg.wave_duration_s)
    if cfg.salt_buckets > 1:
        ds = ds.map_batches(
            lambda b: _add_salt(b, cfg.salt_buckets), batch_format="pyarrow"
        )
        ds = ds.groupby(["host", "salt"]).map_groups(topk, batch_format="pandas")
        ds = ds.drop_columns(["salt"])
    selected = ds.groupby("host").map_groups(topk, batch_format="pandas")
    return selected


def rank_selected(selected_df: pd.DataFrame) -> pd.DataFrame:
    """Canonical ordering columns for the fetch manifest / golden fixtures:
    per-host rank and global rank, both by (priority desc, url asc)."""
    df = selected_df.sort_values(
        ["priority", "url"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    df["global_rank"] = np.arange(len(df), dtype=np.int32)
    df["rank_in_host"] = df.groupby("host").cumcount().astype(np.int32)
    return df
