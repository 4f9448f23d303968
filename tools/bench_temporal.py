"""Temporal-join microbench at volume: synthetic keyed event streams
(deterministic, generated in blocks), timing asof_join and range_join_agg
in both regimes. The events fixture holds 10k rows; this measures the
join rate the 100 TB story depends on.

Usage: python tools/bench_temporal.py [--n-left 2000000] [--n-right 2000000]
       [--n-keys 100000] [--cpus 16]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SPAN_US = 30 * 86_400_000_000  # 30 days of events


def block(block_id: int, rows: int, n_keys: int, salt: int):
    import pyarrow as pa

    i = np.arange(block_id * rows, (block_id + 1) * rows, dtype=np.uint64)
    h1 = (i * np.uint64(0x9E3779B97F4A7C15) + np.uint64(salt)) >> np.uint64(11)
    h2 = (i * np.uint64(0xC2B2AE3D27D4EB4F) + np.uint64(salt * 7)) >> np.uint64(9)
    key = (h1 % np.uint64(n_keys)).astype(np.int64)
    ts = (h2 % np.uint64(SPAN_US)).astype(np.int64)
    return pa.table(
        {
            "event_id": pa.array(i.astype(np.int64), pa.int64()),
            "user_id": pa.array(key, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "rid": pa.array(i.astype(np.int64), pa.int64()),
        }
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-left", type=int, default=2_000_000)
    ap.add_argument("--n-right", type=int, default=2_000_000)
    ap.add_argument("--n-keys", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from abwcf_ray.stages.asof import asof_join, range_join_agg

    rows_per_block = 250_000

    def mk(n, salt):
        nb = (n + rows_per_block - 1) // rows_per_block
        return rd.range(nb).map_batches(
            lambda b, _s=salt: __import__("pyarrow").concat_tables(
                [block(int(i), rows_per_block, args.n_keys, _s)
                 for i in b.column("id").to_pylist()]
            ),
            batch_format="pyarrow",
            batch_size=1,
        ).materialize()

    left = mk(args.n_left, 1)
    right = mk(args.n_right, 2)
    res = {"n_left": args.n_left, "n_right": args.n_right,
           "n_keys": args.n_keys, "cpus": args.cpus}

    t0 = time.perf_counter()
    n = asof_join(
        left, right, key_col="user_id", ts_col="ts",
        left_cols=["event_id", "user_id", "ts"], payload_cols=["rid"],
    ).count()
    res["asof_s"] = round(time.perf_counter() - t0, 3)
    res["asof_rows_per_s"] = int(args.n_left / res["asof_s"])
    assert n == args.n_left

    t0 = time.perf_counter()
    n = asof_join(
        left, right, key_col="user_id", ts_col="ts",
        left_cols=["event_id", "user_id", "ts"], payload_cols=["rid"],
        bucket_span_us=86_400_000_000,
    ).count()
    res["asof_bucketed_s"] = round(time.perf_counter() - t0, 3)
    res["asof_bucketed_rows_per_s"] = int(args.n_left / res["asof_bucketed_s"])
    assert n == args.n_left

    t0 = time.perf_counter()
    n = range_join_agg(
        left, right, key_col="user_id", ts_col="ts",
        left_cols=["event_id", "user_id", "ts"], agg_col="rid",
        width_us=86_400_000_000,
    ).count()
    res["range_s"] = round(time.perf_counter() - t0, 3)
    res["range_rows_per_s"] = int(args.n_left / res["range_s"])
    assert n == args.n_left

    t0 = time.perf_counter()
    n = range_join_agg(
        left, right, key_col="user_id", ts_col="ts",
        left_cols=["event_id", "user_id", "ts"], agg_col="rid",
        width_us=86_400_000_000, bucket_span_us=86_400_000_000,
    ).count()
    res["range_bucketed_s"] = round(time.perf_counter() - t0, 3)
    res["range_bucketed_rows_per_s"] = int(args.n_left / res["range_bucketed_s"])
    assert n == args.n_left

    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
