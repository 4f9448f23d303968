"""Link-graph microbench at volume: a power-law-ish synthetic graph with
``--n-nodes`` nodes and ``--n-edges`` edges (deterministic, generated in
blocks so no single array holds the edge list), timing degrees + PageRank
in both regimes. The sf fixtures yield only ~1k edges, so per-op costs
there are all fixed overhead — this measures the edge-streaming rate the
100 TB story depends on.

Usage: python tools/bench_graph.py [--n-nodes 2000000] [--n-edges 10000000]
       [--cpus 16] [--iters 3]
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


def edge_block(block_id: int, rows: int, n_nodes: int):
    import pyarrow as pa

    # multiplicative-hash sequence: uniform src, skewed dst (power-law-ish
    # via squaring the unit hash so low ids absorb most in-links)
    i = np.arange(block_id * rows, (block_id + 1) * rows, dtype=np.uint64)
    h1 = (i * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(11)
    h2 = ((i + np.uint64(1 << 40)) * np.uint64(0xC2B2AE3D27D4EB4F)) >> np.uint64(11)
    src = (h1 % np.uint64(n_nodes)).astype(np.int64)
    u = (h2 % np.uint64(1 << 20)).astype(np.float64) / float(1 << 20)
    dst = (u * u * n_nodes).astype(np.int64)
    keep = src != dst
    return pa.table(
        {
            "src": pa.array(src[keep], pa.int64()),
            "dst": pa.array(dst[keep], pa.int64()),
        }
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-nodes", type=int, default=2_000_000)
    ap.add_argument("--n-edges", type=int, default=10_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dist-partitions", type=int, default=64)
    args = ap.parse_args()

    import ray
    import ray.data as rd

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from abwcf_ray.stages.graph import degrees, pagerank

    rows_per_block = 250_000
    n_blocks = (args.n_edges + rows_per_block - 1) // rows_per_block
    edges = rd.range(n_blocks).map_batches(
        lambda b, _r=rows_per_block, _n=args.n_nodes: __import__(
            "pyarrow"
        ).concat_tables(
            [edge_block(int(i), _r, _n) for i in b.column("id").to_pylist()]
        ),
        batch_format="pyarrow",
        batch_size=1,
    )
    edges = edges.materialize()
    n_edges = edges.count()

    res: dict = {
        "n_nodes": args.n_nodes,
        "n_edges": n_edges,
        "cpus": args.cpus,
        "iters": args.iters,
    }

    t0 = time.perf_counter()
    deg = degrees(edges)
    n_deg = deg.count()
    res["degrees_s"] = round(time.perf_counter() - t0, 3)
    res["degrees_edges_per_s"] = int(n_edges / res["degrees_s"])
    res["n_touched_nodes"] = n_deg

    t0 = time.perf_counter()
    pr = pagerank(edges, n_nodes=args.n_nodes, iters=args.iters)
    pr_rows = pr.count()
    res["pagerank_broadcast_s"] = round(time.perf_counter() - t0, 3)
    res["pagerank_broadcast_edge_iters_per_s"] = int(
        n_edges * args.iters / res["pagerank_broadcast_s"]
    )
    assert pr_rows == args.n_nodes

    t0 = time.perf_counter()
    prd = pagerank(
        edges,
        n_nodes=args.n_nodes,
        iters=args.iters,
        broadcast_max_nodes=0,
        merge_partitions=args.dist_partitions,
    )
    prd_rows = prd.count()
    res["pagerank_distributed_s"] = round(time.perf_counter() - t0, 3)
    res["pagerank_distributed_edge_iters_per_s"] = int(
        n_edges * args.iters / res["pagerank_distributed_s"]
    )
    assert prd_rows == args.n_nodes

    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
