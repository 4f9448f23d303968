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
