"""Deduplication stages for training-data pipelines.

Five families, each expressed Ray-Data-first:

- exact:      content hash in ``map_batches`` -> ``groupby(hash)`` -> keep
              the min-id row per group (one shuffle of (hash, id) pairs).
- minhash-LSH: shingle -> minhash signature per batch (vectorized universal
              hashing) -> explode to (band, band_hash, doc_id) rows ->
              ``groupby(band, band_hash)`` -> candidate pairs -> verify by
              signature similarity -> connected components.
- simhash:    64-bit simhash per batch -> band by 4x16-bit chunks ->
              ``groupby(chunk)`` -> candidate pairs -> verify Hamming
              distance.
- n-gram Jaccard: minhash-LSH candidates verified with EXACT Jaccard over
              shingle-hash sets.
- embedding:  random-hyperplane LSH buckets -> within-bucket cosine.

Candidate-pair verification happens inside the bucket groups (distributed);
only the verified EDGES come back to the driver for the union-find — at
10^10-doc scale that step becomes a few rounds of min-label propagation
(groupby on node id), which `connected_components_labels` implements the
driver-side equivalent of. Duplicate clusters are labeled by their minimum
doc id, so results are deterministic.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64

_MERSENNE = np.uint64((1 << 61) - 1)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    h = hash64(batch.column(col).to_pylist())
    return batch.append_column("content_hash", pa.array(h, pa.uint64()))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Exact dedup by content hash -> (content_hash, <id_col>, dup_count):
    the minimum id per distinct content plus its duplicate count.

    Fully vectorized and shuffle-light: per-batch pandas partials (one row
    per distinct hash per batch) reduce the exchange to the distinct-hash
    cardinality BEFORE the groupby, and the final aggregate is Ray's native
    Min/Sum — no per-group Python callables (at 10^9-doc scale a per-group
    pandas call per distinct document would dominate)."""
    from ray.data.aggregate import Min, Sum

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, col).select([id_col, "content_hash"]),
        batch_format="pyarrow",
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("content_hash", as_index=False)[id_col].agg(["min", "size"])
        g.columns = ["content_hash", "min_id", "n"]
        return g

    return (
        hashed.map_batches(partial, batch_format="pandas")
        .groupby("content_hash")
        .aggregate(Min("min_id", alias_name=id_col), Sum("n", alias_name="dup_count"))
    )


# --------------------------------------------------------------------------
# shingles + minhash
# --------------------------------------------------------------------------
def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of word k-shingles (whitespace tokens)."""
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    if len(toks) <= k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(hash64(grams))


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod 2^61-1 universal hashing; min per permutation."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = (sh % _MERSENNE)[None, :]
    vals = (a[:, None] * x + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def make_minhash_stage(num_perm: int = 64, shingle_k: int = 5, seed: int = 42,
                       text_col: str = "text", id_col: str = "doc_id"):
    a, b = _perm_params(num_perm, seed)

    def minhash_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = [
            minhash_signature(_shingle_hashes(t or "", shingle_k), a, b)
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {
                id_col: pa.array(ids),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )

    return minhash_batch


def make_band_explode(bands: int, num_perm: int, id_col: str = "doc_id"):
    """signature rows -> (band, band_hash, doc_id, sig) rows for the LSH
    bucket groupby."""
    rows_per_band = num_perm // bands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = batch.column("sig").to_pylist()
        out_id, out_band, out_bh, out_sig = [], [], [], []
        for i, sig in zip(ids, sigs):
            arr = np.asarray(sig, dtype=np.uint64)
            for bd in range(bands):
                chunk = arr[bd * rows_per_band : (bd + 1) * rows_per_band]
                bh = int(hash64([" ".join(map(str, chunk))])[0])
                out_id.append(i)
                out_band.append(bd)
                out_bh.append(bh)
                out_sig.append(sig)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_bh, pa.uint64()),
                "sig": pa.array(out_sig, pa.list_(pa.uint64())),
            }
        )

    return explode


def make_bucket_pairs(threshold: float, id_col: str = "doc_id"):
    """Within one (band, band_hash) bucket: emit verified candidate edges
    (signature-similarity >= threshold). Buckets are tiny (docs agreeing on
    a whole band), so the quadratic scan is local and bounded."""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                 "dst": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs = np.stack([np.asarray(s, dtype=np.uint64) for s in g["sig"]])
        src, dst, sim = [], [], []
        for i in range(len(ids)):
            eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for j_off, s in enumerate(eq):
                if s >= threshold:
                    src.append(int(ids[i]))
                    dst.append(int(ids[i + 1 + j_off]))
                    sim.append(float(s))
        return pd.DataFrame({"src": src, "dst": dst, "sim": sim})

    return bucket_pairs


def normalize_pairs(pairs: pd.DataFrame) -> pd.DataFrame:
    """Guard for the no-candidates case: Ray's concat of all-empty groups can
    drop columns entirely."""
    if "src" not in pairs.columns:
        return pd.DataFrame(
            {"src": pd.Series([], dtype="int64"), "dst": pd.Series([], dtype="int64")}
        )
    return pairs.drop_duplicates(["src", "dst"])


def connected_components_labels(edges: pd.DataFrame, all_ids: np.ndarray) -> pd.DataFrame:
    """Union-find over verified edges -> (id, cluster) where cluster is the
    component's min id. Driver-side: the edge set is the verified-duplicate
    graph, orders of magnitude smaller than the corpus; the distributed
    equivalent is iterated min-label propagation via groupby."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for s, d in zip(edges["src"], edges["dst"]):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    labels = [find(int(i)) for i in all_ids]
    return pd.DataFrame({"doc_id": all_ids.astype(np.int64), "cluster": np.asarray(labels, dtype=np.int64)})


def _pairs_from_buckets(bucket_keys: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """(bucket_key, id) rows -> unique candidate (src < dst) pairs via a
    vectorized self-merge per bucket. Per-bucket Python callables cost ~1 ms
    per bucket, which dominates when buckets are tiny (most are singletons);
    the merge is one hash join. At 10^10-doc scale this becomes a
    distributed join keyed by bucket_key — same shape, sharded."""
    multi = bucket_keys.groupby("bucket_key")[id_col].nunique()
    live = multi[multi > 1].index
    b = bucket_keys[bucket_keys["bucket_key"].isin(live)]
    joined = b.merge(b, on="bucket_key", suffixes=("_a", "_b"))
    joined = joined[joined[f"{id_col}_a"] < joined[f"{id_col}_b"]]
    out = joined.rename(columns={f"{id_col}_a": "src", f"{id_col}_b": "dst"})[
        ["src", "dst"]
    ].drop_duplicates()
    return out.reset_index(drop=True)


def minhash_lsh_dedup(
    ds,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Full near-dup pipeline -> (doc_id, cluster, is_dup) pandas frame.

    Signatures are computed distributed (``map_batches``); the banded
    bucket keys + signature table come back to the driver for vectorized
    candidate generation and verification (they are num_perm·8 bytes per
    doc — the scale path shards the self-join and verification by
    bucket_key, same dataflow)."""
    rows_per_band = num_perm // bands
    sig_df = ds.map_batches(
        make_minhash_stage(num_perm, shingle_k, seed, text_col, id_col),
        batch_format="pyarrow",
    ).to_pandas()
    sig_df = sig_df.sort_values(id_col).reset_index(drop=True)
    sig_mat = np.stack([np.asarray(s, dtype=np.uint64) for s in sig_df["sig"]])
    ids = sig_df[id_col].to_numpy()
    pos_by_id = pd.Series(np.arange(len(ids)), index=ids)

    # banded bucket keys, vectorized: hash each band's contiguous slice
    buckets = []
    for bd in range(bands):
        chunk = sig_mat[:, bd * rows_per_band : (bd + 1) * rows_per_band]
        key = hash64(
            [f"{bd}|" + " ".join(map(str, row)) for row in chunk]
        ).astype(np.uint64)
        buckets.append(pd.DataFrame({"bucket_key": key, id_col: ids}))
    pairs = _pairs_from_buckets(pd.concat(buckets, ignore_index=True), id_col)

    # vectorized signature-similarity verification
    if len(pairs):
        a = sig_mat[pos_by_id[pairs["src"]].to_numpy()]
        b = sig_mat[pos_by_id[pairs["dst"]].to_numpy()]
        sim = (a == b).mean(axis=1)
        pairs = pairs[sim >= threshold]
    labels = connected_components_labels(pairs, np.sort(ids))
    labels["is_dup"] = labels["doc_id"] != labels["cluster"]
    if id_col != "doc_id":
        labels = labels.rename(columns={"doc_id": id_col})
    return labels


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------
def make_simhash_stage(text_col: str = "text", id_col: str = "doc_id"):
    def simhash_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out = np.zeros(len(ids), dtype=np.uint64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            if not toks:
                continue
            h = hash64(toks)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((v > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        return pa.table({id_col: pa.array(ids), "simhash": pa.array(out, pa.uint64())})

    return simhash_batch


def simhash_dedup(ds, *, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> pd.DataFrame:
    """Near-dup by simhash: band the 64 bits into 4 chunks of 16 (any pair
    within Hamming<=3 must agree on >=1 chunk), vectorized bucket self-merge,
    vectorized popcount verification."""
    sig_df = (
        ds.map_batches(make_simhash_stage(text_col, id_col), batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col)
        .reset_index(drop=True)
    )
    ids = sig_df[id_col].to_numpy()
    sh = sig_df["simhash"].to_numpy(dtype=np.uint64)
    pos_by_id = pd.Series(np.arange(len(ids)), index=ids)

    buckets = []
    for c in range(4):
        key = (((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)) << np.uint64(2)) | np.uint64(c)
        buckets.append(pd.DataFrame({"bucket_key": key, id_col: ids}))
    pairs = _pairs_from_buckets(pd.concat(buckets, ignore_index=True), id_col)

    if len(pairs):
        a = sh[pos_by_id[pairs["src"]].to_numpy()]
        b = sh[pos_by_id[pairs["dst"]].to_numpy()]
        x = (a ^ b).view(np.uint64)
        ham = np.unpackbits((x[:, None]).view(np.uint8), axis=1).sum(axis=1)
        pairs = pairs[ham <= max_hamming]
    labels = connected_components_labels(pairs, np.sort(ids))
    labels["is_dup"] = labels["doc_id"] != labels["cluster"]
    if id_col != "doc_id":
        labels = labels.rename(columns={"doc_id": id_col})
    return labels


# --------------------------------------------------------------------------
# n-gram Jaccard (exact verify on LSH candidates)
# --------------------------------------------------------------------------
def ngram_jaccard_dedup(
    ds,
    *,
    shingle_k: int = 3,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 32,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """LSH candidates (aggressive banding = high recall) verified by EXACT
    Jaccard over shingle-hash sets, joined in via a second pass."""
    shingle_ds = ds.map_batches(
        lambda b: pa.table(
            {
                id_col: b.column(id_col),
                "shingles": pa.array(
                    [
                        _shingle_hashes(t or "", shingle_k).tolist()
                        for t in b.column(text_col).to_pylist()
                    ],
                    pa.list_(pa.uint64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    shingle_map = {
        r[id_col]: set(r["shingles"]) for r in shingle_ds.take_all()
    }  # test-scale only; at scale this is a bucketed join of pair->shingles
    cand = minhash_lsh_dedup(
        ds, num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        threshold=0.0, seed=seed, text_col=text_col, id_col=id_col,
    )
    # rebuild candidate edges from clusters, verify exactly (minhash output
    # already carries the caller's id_col name)
    edges = []
    by_cluster = defaultdict(list)
    for doc_id, cluster in zip(cand[id_col], cand["cluster"]):
        by_cluster[int(cluster)].append(int(doc_id))
    for members in by_cluster.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b_ = shingle_map[members[i]], shingle_map[members[j]]
                inter = len(a & b_)
                union = len(a | b_)
                if union and inter / union >= threshold:
                    edges.append((members[i], members[j]))
    edges_df = pd.DataFrame(edges, columns=["src", "dst"]) if edges else pd.DataFrame(
        {"src": pd.Series([], dtype="int64"), "dst": pd.Series([], dtype="int64")}
    )
    all_ids = np.sort(np.asarray(ds.select_columns([id_col]).to_pandas()[id_col]))
    labels = connected_components_labels(edges_df, all_ids)
    labels["is_dup"] = labels["doc_id"] != labels["cluster"]
    if id_col != "doc_id":
        labels = labels.rename(columns={"doc_id": id_col})
    return labels


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------
def embedding_dedup(
    ds,
    *,
    threshold: float = 0.95,
    planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Random-hyperplane LSH buckets -> within-bucket exact cosine verify.
    ``planes`` controls bucket granularity (recall drops for borderline
    pairs split across buckets — the standard LSH trade-off, mitigated by
    multiple tables at scale)."""
    first = ds.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    hyper = rng.standard_normal((dim, planes))

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.clip(norms, 1e-12, None)
        signs = (unit @ hyper) > 0
        keys = np.packbits(signs, axis=1, bitorder="little")[:, 0].astype(np.int64)
        if planes > 8:
            packed = np.packbits(signs, axis=1, bitorder="little")
            keys = np.zeros(len(ids), dtype=np.int64)
            for c in range(packed.shape[1]):
                keys |= packed[:, c].astype(np.int64) << (8 * c)
        return pa.table(
            {
                id_col: pa.array(ids),
                "bucket_key": pa.array(keys, pa.int64()),
                "unit": pa.array([u.tolist() for u in unit], pa.list_(pa.float64())),
            }
        )

    bdf = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col)
        .reset_index(drop=True)
    )
    ids = bdf[id_col].to_numpy()
    unit = np.stack([np.asarray(v) for v in bdf["unit"]])
    pos_by_id = pd.Series(np.arange(len(ids)), index=ids)
    pairs = _pairs_from_buckets(
        bdf[["bucket_key", id_col]].copy(), id_col
    )
    if len(pairs):
        a = unit[pos_by_id[pairs["src"]].to_numpy()]
        b = unit[pos_by_id[pairs["dst"]].to_numpy()]
        cos = (a * b).sum(axis=1)
        pairs = pairs[cos >= threshold]
    labels = connected_components_labels(pairs, np.sort(ids))
    labels = labels.rename(columns={"doc_id": id_col})
    labels["is_dup"] = labels[id_col] != labels["cluster"]
    return labels
