"""SemDeDup: semantic deduplication by k-means cluster then within-cluster
cosine pruning (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication").

Shape on Ray Data — the entire candidate/verify/CC machinery is SHARED with
the LSH embedding dedup (``stages/dedup.py``); only candidate generation
differs:

1. **Cluster fit** — the existing distributed deterministic k-means
   (``similarity.kmeans_fit``: seeded hash-reservoir init over all blocks +
   Lloyd steps as per-batch partial sums). At web scale ``n_clusters``
   grows with sqrt(N) (the paper uses 50k clusters for LAION-440M), so the
   centroid matrix stays a small broadcast and every cluster stays small
   enough for within-cluster pair generation — that bounded-cluster
   assumption IS the SemDeDup approximation, and is this operator's
   documented partitioning assumption.
2. **Candidate generation** — each vector's nearest centroid becomes its
   ``bucket_key`` (one SLIM (id, bucket_key, pkey) row per vector — 24
   bytes; the embedding never rides through this exchange). Pairs spanning
   clusters are never considered — exactly the paper's recall trade.
3. **Verify + labels** — the shared distributed exact-cosine verify
   (unit-vector payloads cross the exchange once per doc) -> connected
   components -> keep-min-id representative.

Deviation from the paper, documented: the paper keeps the cluster member
with the LOWEST similarity to the centroid; this engine keeps the MIN id of
each connected component — the same deterministic representative rule as
every other dedup family here (and SQL-checkable; the paper itself notes
the choice of keeper is near-immaterial, §4.4 "choosing examples to keep").

Degenerate-parameter value oracle: ``n_clusters=1`` makes candidate
generation exhaustive, so the full machinery (fit, assign, slim explode,
partitioned pairs, distributed verify, CC, labels) must equal all-pairs
cosine dedup — the same recursive-CTE SQL as ``embedding_dedup_exact``.

Reference anchor: the reference engine (a crawler) has no semantic dedup;
this operator extends the training-data family per the build brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from abwcf_ray.stages.dedup import (
    CC_EDGE_THRESHOLD,
    DEDUP_MERGE_PARTITIONS,
    _labels_result,
    _verify_cosine,
    candidate_edges_ds,
    make_unit_stage,
    verify_edges_distributed,
)
from abwcf_ray.stages.similarity import _batch_ids, _batch_vectors, kmeans_fit


def make_cluster_bucketize(
    centroids_ref,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    merge_partitions: int = DEDUP_MERGE_PARTITIONS,
):
    """map_batches stage: nearest-centroid assignment as SLIM
    (id, bucket_key, pkey) rows. ``centroids_ref`` is a ``ray.ObjectRef``
    to the (k, dim) centroid matrix (broadcast once) — or the matrix
    itself in tests."""

    def bucketize(batch: pa.Table) -> pa.Table:
        c = (
            ray.get(centroids_ref)
            if isinstance(centroids_ref, ray.ObjectRef)
            else centroids_ref
        )
        ids = _batch_ids(batch, id_col)
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "bucket_key": pa.array([], pa.int64()),
                    "pkey": pa.array([], pa.int64()),
                }
            )
        v = _batch_vectors(batch, vec_col)
        assign = np.argmin(
            ((v[:, None, :] - c[None, :, :]) ** 2).sum(-1), axis=1
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "bucket_key": pa.array(assign, pa.int64()),
                "pkey": pa.array(assign % merge_partitions, pa.int64()),
            }
        )

    return bucketize


def semdedup(
    ds,
    *,
    n_clusters: int = 16,
    threshold: float = 0.95,
    kmeans_iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    merge_partitions: int = DEDUP_MERGE_PARTITIONS,
    return_dataset: bool = False,
    cc_edge_threshold: int = CC_EDGE_THRESHOLD,
):
    """Cluster-then-dedup -> (id_col, cluster, is_dup), the same result
    contract as every dedup family here. ``n_clusters`` trades recall for
    candidate volume (1 = exhaustive exact dedup; sqrt(N)-ish at scale)."""
    centroids = kmeans_fit(
        ds, n_clusters, iters=kmeans_iters, seed=seed,
        vec_col=vec_col, id_col=id_col,
    )
    keyed = ds.map_batches(
        make_cluster_bucketize(
            ray.put(centroids), vec_col, id_col, merge_partitions
        ),
        batch_format="pyarrow",
    )
    cand = candidate_edges_ds(keyed, id_col)
    payload = ds.map_batches(
        make_unit_stage(vec_col, id_col), batch_format="pyarrow"
    )
    edges = verify_edges_distributed(
        cand,
        payload,
        _verify_cosine(threshold),
        payload_type=pa.list_(pa.float64()),
        id_col=id_col,
        merge_partitions=merge_partitions,
    )
    return _labels_result(
        ds, edges, id_col, return_dataset,
        cc_edge_threshold=cc_edge_threshold, merge_partitions=merge_partitions,
    )
