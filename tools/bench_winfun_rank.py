"""At-volume microbench: keyed window functions + global total-order rank.

Synthesizes N rows (deterministic), times each operator warm (one warmup
run excluded), prints one JSON line. Usage:

    python tools/bench_winfun_rank.py [n_rows] [num_cpus]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from abwcf_ray.stages.rank import global_rank
    from abwcf_ray.stages.winfun import keyed_window_functions

    rng = np.random.default_rng(1)
    rank_ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "k": pa.array(rng.integers(0, n // 50 + 1, n).astype(np.int64)),
            }
        )
    ).repartition(64).materialize()
    win_ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "k": pa.array(rng.integers(0, n // 25 + 1, n).astype(np.int64)),
                "ts": pa.array(rng.integers(0, 10**9, n).astype(np.int64)),
                "v": pa.array(rng.integers(0, 100, n).astype(np.int64)),
            }
        )
    ).repartition(64).materialize()

    def time_op(fn):
        fn()  # warmup (worker spin-up)
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    rank_s = time_op(
        lambda: global_rank(rank_ds, key_col="k", id_col="id").count()
    )
    win_s = time_op(
        lambda: keyed_window_functions(
            win_ds, key_col="k", order_cols=["ts", "id"],
            sum_col="v", lag_col="ts",
        ).count()
    )
    print(
        json.dumps(
            {
                "n_rows": n,
                "num_cpus": cpus,
                "global_rank_s": rank_s,
                "global_rank_mrows_s": round(n / rank_s / 1e6, 2),
                "window_functions_s": win_s,
                "window_functions_mrows_s": round(n / win_s / 1e6, 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
