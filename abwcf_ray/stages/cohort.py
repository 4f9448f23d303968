"""Cohort retention matrix — the classic user-analytics triangle: users
are cohorted by their FIRST activity bucket (day N of the corpus), and
each later active bucket counts them at offset (active − cohort).

Distributed shape: ONE hash(user) exchange does all the per-user work —
map-side partials first shrink each batch to its distinct (user,
bucket) pairs (the combiner: re-activity within a batch collapses
before anything crosses the wire), then each user lands whole in one
shard where its cohort (min bucket) and offsets are one vectorized
grouped-min + subtract. The per-shard output is (cohort, offset) pair
counts — bounded by buckets², not users — so the final merge is a tiny
second keyed aggregate. Exact int64 end-to-end; the SQL oracle is the
standard DISTINCT-activity + MIN-cohort join and hash-matches
bit-for-bit.

Scale contract: one user's distinct buckets must fit in its shard (the
PARTITION BY contract, trivially true for bounded time ranges); the
(cohort, offset) domain must be small enough for the final merge
(buckets² rows — days over months, weeks over years: always tiny).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import keyed_hash_agg


def cohort_retention(
    ds,
    *,
    user_col: str,
    bucket_col: str,
    partitions: int = 64,
):
    """Dataset of (user, bucket:int64) activity rows -> Dataset of
    (cohort:int64, offset:int64, n_users:int64): for each first-activity
    bucket, how many of its users were active again ``offset`` buckets
    later (offset 0 = the cohort size itself)."""

    def distinct_pairs(t: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {
                user_col: t.column(user_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                bucket_col: t.column(bucket_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        pdf = g.drop_duplicates()  # cross-batch duplicates meet here
        u = pdf[user_col].to_numpy(np.int64)
        b = pdf[bucket_col].to_numpy(np.int64)
        codes, _ = pd.factorize(u, use_na_sentinel=False)
        cohort = np.full(codes.max() + 1 if len(codes) else 0, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cohort, codes, b)
        off = b - cohort[codes]
        pair = pd.DataFrame({"cohort": cohort[codes], "offset": off})
        out = pair.groupby(["cohort", "offset"], as_index=False, sort=False).size()
        out = out.rename(columns={"size": "n_users"})
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    pairs = keyed_hash_agg(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        lambda t: t.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64),
        per_user,
        partitions=partitions,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["cohort", "offset"], as_index=False, sort=False).agg(
            n_users=("n_users", "sum")
        )
        m["n_users"] = m["n_users"].astype(np.int64)
        return m

    return keyed_hash_agg(
        pairs,
        lambda t: t.column("cohort").to_numpy(zero_copy_only=False).astype(np.int64)
        * np.int64(1_000_003)
        + t.column("offset").to_numpy(zero_copy_only=False).astype(np.int64),
        final,
        partitions=8,
    )
