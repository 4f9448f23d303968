"""Distributed set operations with DISTINCT semantics: INTERSECT,
EXCEPT, UNION over key tuples of two Datasets.

SQL's bag-to-set operators. The distributed shape: map-side per-batch
DISTINCT with a side flag (the combiner — duplicate tuples collapse
before anything crosses the wire), the two flagged streams concatenated
with Dataset.union (plan-level concat, no data movement), then ONE
keyed-partition exchange on hash(tuple) (the dedup.keyed_hash_agg idiom
— exchange O(distinct tuples), never O(rows)) where per-partition
presence flags merge by MAX and the operator's predicate filters:

    intersect:  in_l AND in_r
    except:     in_l AND NOT in_r
    union:      in_l OR in_r   (i.e. all distinct tuples)

Each distinct tuple lands in exactly one partition, so the per-partition
filter is globally correct; output is the distinct tuple set, streamed
(never driver-materialized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import keyed_hash_agg

_OPS = ("intersect", "except", "union")


def set_op(
    left,
    right,
    *,
    op: str,
    key_cols: list[str],
    partitions: int = 64,
):
    """DISTINCT-semantics set operation over ``key_cols`` tuples. Returns
    a Dataset with exactly ``key_cols`` — the distinct tuples satisfying
    ``op`` (``"intersect"`` / ``"except"`` — left minus right — /
    ``"union"``)."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}")

    def make_partial(is_left: bool):
        def partial(t: pa.Table) -> pa.Table:
            g = t.select(key_cols).to_pandas().drop_duplicates()
            g["in_l"] = np.int64(1 if is_left else 0)
            g["in_r"] = np.int64(0 if is_left else 1)
            return pa.Table.from_pandas(g, preserve_index=False)

        return partial

    tagged = left.map_batches(make_partial(True), batch_format="pyarrow").union(
        right.map_batches(make_partial(False), batch_format="pyarrow")
    )

    def key_of(b: pa.Table) -> np.ndarray:
        k = hash64(b.column(key_cols[0]))
        for c in key_cols[1:]:
            k = k * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b.column(c))
        return k

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(key_cols, as_index=False, sort=False).agg(
            in_l=("in_l", "max"), in_r=("in_r", "max")
        )
        if op == "intersect":
            m = m[(m["in_l"] == 1) & (m["in_r"] == 1)]
        elif op == "except":
            m = m[(m["in_l"] == 1) & (m["in_r"] == 0)]
        return m[key_cols]

    return keyed_hash_agg(tagged, key_of, merge, partitions=partitions)


def group_jaccard_matrix(
    ds,
    *,
    group_col: str,
    text_col: str = "text",
    tokenize: bool = True,
    partitions: int = 64,
):
    """Pairwise Jaccard similarity between GROUPS over their distinct
    item sets — the mirror-detection / source-similarity matrix (which
    crawl sources carry near-identical vocabularies). Returns a pandas
    DataFrame (s1, s2, shared, n1, n2, jaccard) for every group pair
    sharing at least one item, s1 < s2, sorted.

    Distributed shape: per-batch DISTINCT (group, item-hash) combiner;
    ONE keyed exchange on hash(item) co-locates each item's group set,
    where pair emission is vectorized (sorted segments + a shift-by-k
    sweep, k <= #groups — no per-item Python); per-partition pair
    counts and per-group vocab partials are each O(groups²) rows, both
    driver-merged (the output itself is O(groups²), so the driver holds
    nothing larger than the answer). Item identity is hash64(item) —
    the ngram_dedup 64-bit collision-soundness contract. Assumes the
    number of GROUPS is driver-small (sources, languages, shards);
    items are unbounded.

    ``jaccard = shared / (n1 + n2 - shared)`` — one IEEE division of
    exact int64s, mirrored verbatim by the SQL oracle.
    """

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col).to_pandas().astype("string").fillna("")
        grp = t.column(group_col).to_pandas()
        if tokenize:
            items = col.str.findall(r"\S+")
            reps = items.str.len().fillna(0).astype(np.int64).to_numpy()
            flat = items.explode().dropna()
            g = grp.to_numpy().repeat(reps)[: len(flat)]
            h = hash64(flat.tolist()) if len(flat) else np.zeros(0, np.uint64)
        else:
            g = grp.to_numpy()
            h = hash64(col.tolist()) if len(col) else np.zeros(0, np.uint64)
        df = pd.DataFrame({"g": g, "h": h.astype(np.int64)}).drop_duplicates()
        # NULL groups are excluded (SQL GROUP BY NULL semantics); this also
        # keeps the g-isna tag free to mark pair-partials downstream — a
        # null-group row here would misroute its vocab rows into the pairs
        # bucket in pairs_of().
        df = df[df["g"].notna()]
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs_of(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates().sort_values(["h", "g"], kind="mergesort")
        h = part["h"].to_numpy()
        g = part["g"].to_numpy()
        # vocab partials: each distinct (g, item) contributes 1
        vocab = part.groupby("g", as_index=False).agg(n=("h", "size"))
        vocab["n"] = vocab["n"].astype(np.int64)
        # segment boundaries per item
        new_seg = np.r_[True, h[1:] != h[:-1]]
        seg_id = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)
        seg_len = np.diff(np.r_[seg_start, len(h)])
        pos = np.arange(len(h)) - seg_start[seg_id]
        rows = []
        m_max = int(seg_len.max()) if len(seg_len) else 0
        for k in range(1, m_max):
            ok = pos + k < seg_len[seg_id]
            idx = np.flatnonzero(ok)
            if len(idx):
                rows.append(pd.DataFrame({"s1": g[idx], "s2": g[idx + k]}))
        if rows:
            pc_ = (
                pd.concat(rows)
                .groupby(["s1", "s2"], as_index=False)
                .agg(shared=("s1", "size"))
            )
            pc_["shared"] = pc_["shared"].astype(np.int64)
        else:
            pc_ = pd.DataFrame(
                {"s1": pd.Series(dtype=g.dtype if len(g) else object),
                 "s2": pd.Series(dtype=g.dtype if len(g) else object),
                 "shared": pd.Series(dtype=np.int64)}
            )
        # tag the two partial kinds into one frame (pairs + vocab)
        pc_["g"] = None
        pc_["n"] = np.int64(0)
        vocab["s1"] = None
        vocab["s2"] = None
        vocab["shared"] = np.int64(0)
        return pd.concat(
            [pc_[["s1", "s2", "shared", "g", "n"]],
             vocab[["s1", "s2", "shared", "g", "n"]]],
            ignore_index=True,
        )

    merged = keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda b: b.column("h").to_numpy(zero_copy_only=False),
        pairs_of,
        partitions=partitions,
    ).to_pandas()
    vocab = (
        merged[merged["g"].notna()]
        .groupby("g", as_index=False)
        .agg(n=("n", "sum"))
        .set_index("g")["n"]
    )
    pairs = (
        merged[merged["g"].isna()]
        .groupby(["s1", "s2"], as_index=False)
        .agg(shared=("shared", "sum"))
    )
    if not len(pairs):
        return pd.DataFrame(
            columns=["s1", "s2", "shared", "n1", "n2", "jaccard"]
        )
    n1 = vocab.loc[pairs["s1"]].to_numpy(np.int64)
    n2 = vocab.loc[pairs["s2"]].to_numpy(np.int64)
    shared = pairs["shared"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "s1": pairs["s1"],
            "s2": pairs["s2"],
            "shared": shared,
            "n1": n1,
            "n2": n2,
            "jaccard": shared.astype(np.float64)
            / (n1 + n2 - shared).astype(np.float64),
        }
    )
    return out.sort_values(["s1", "s2"], kind="mergesort").reset_index(
        drop=True
    )
