"""Markov transition matrix over an event stream — the sessionized
path-mining primitive: for each user's history ordered by time, count
every consecutive (event_type -> next event_type) step, globally.

The output is the first-order Markov chain of user behavior (click-path
analysis, next-action priors for curriculum mixing). Counts are exact
int64; the per-source probability is ONE IEEE division of two exact
integers, mirrored verbatim by the SQL oracle (the repo's float-hash
discipline, see repetition_signals).

Distributed shape: ONE hash(user)-keyed exchange (the funnel/winfun
idiom — each user's history lands whole in one shard; transitions never
cross shard boundaries because users don't), then a per-shard vectorized
scan: mergesort by (user, order_cols), factorize the type column, and
the bigram counts are one ``np.add.at`` over ``src_code * K + dst_code``
for the row pairs whose user matches — no per-event Python loop. Each
shard emits at most K^2 partial rows (K = distinct event types, tiny),
so the final merge is a driver-side pandas groupby over
partitions * K^2 rows, politeness-bounded by the type vocabulary, never
by the event count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import keyed_hash_agg

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def transition_counts(
    ds,
    *,
    user_col: str,
    order_cols: list[str],
    type_col: str,
    partitions: int = 64,
):
    """Per-shard partial transition counts: Dataset of (src, dst, n) where
    n = number of i with user[i] == user[i+1] and (type[i], type[i+1]) ==
    (src, dst) in the per-user (order_cols) order. ``order_cols`` must be
    a total order per user (append a unique id column)."""

    def key_of(b: pa.Table) -> np.ndarray:
        return (
            b.column(user_col).to_numpy(zero_copy_only=False).view(np.uint64)
            * _GOLD
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "src": pd.Series([], dtype=object),
                "dst": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values([user_col, *order_cols], kind="mergesort")
        users = g[user_col].to_numpy()
        types, codes = np.unique(g[type_col].to_numpy(), return_inverse=True)
        k = len(types)
        same = users[1:] == users[:-1]
        if not same.any():
            return empty
        pair = codes[:-1][same] * k + codes[1:][same]
        counts = np.bincount(pair, minlength=k * k).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pd.DataFrame(
            {
                "src": types[nz // k],
                "dst": types[nz % k],
                "n": counts[nz],
            }
        )

    return keyed_hash_agg(ds, key_of, scan, partitions=partitions)


def transition_matrix(
    ds,
    *,
    user_col: str,
    order_cols: list[str],
    type_col: str,
    partitions: int = 64,
) -> pd.DataFrame:
    """The global first-order Markov chain: one row per observed
    (src, dst) transition — (src, dst, n, p) with n the exact transition
    count and p = n / total-transitions-out-of-src (one IEEE division of
    two exact int64s). Rows sorted by (src, dst)."""
    parts = transition_counts(
        ds,
        user_col=user_col,
        order_cols=order_cols,
        type_col=type_col,
        partitions=partitions,
    ).to_pandas()
    m = (
        parts.groupby(["src", "dst"], as_index=False)["n"]
        .sum()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    src_tot = m.groupby("src")["n"].transform("sum").to_numpy()
    m["p"] = m["n"].to_numpy().astype(np.float64) / src_tot.astype(np.float64)
    return m


def longest_streak(
    ds,
    *,
    user_col: str,
    order_cols: list[str],
    type_col: str,
    partitions: int = 64,
):
    """Longest run of CONSECUTIVE identical ``type_col`` values per user
    (ordered by ``order_cols``) — the classic gaps-and-islands streak
    statistic (engagement streaks, repeated-action loops, crawler
    retry-storm detection).

    Same one-exchange shape as :func:`transition_counts`: each user's
    history lands whole in one hash(user) shard, then the scan is fully
    vectorized — lexsort by (user, order), run boundaries where user OR
    type changes, run lengths via one bincount, per-user max via a
    second grouped reduction. Exact int64; the SQL oracle is the
    standard ROW_NUMBER-difference islands query and hash-matches
    bit-for-bit. Returns (user_col, max_streak:int64).
    """
    from abwcf_ray.functions.hashing import hash64

    cols = [user_col, type_col] + order_cols

    def slim(t: pa.Table) -> pa.Table:
        return t.select(cols)

    def key_of(b: pa.Table) -> np.ndarray:
        c = b.column(user_col)
        if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
            return hash64(c)
        return c.to_numpy(zero_copy_only=False).astype(np.int64)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    user_col: g[user_col],
                    "max_streak": pd.Series([], dtype=np.int64),
                }
            )
        ucodes, uuniq = pd.factorize(g[user_col].to_numpy(), use_na_sentinel=False)
        tcodes, _ = pd.factorize(g[type_col].to_numpy(), use_na_sentinel=False)
        keys = [g[c].to_numpy() for c in reversed(order_cols)] + [ucodes]
        order = np.lexsort(tuple(keys))
        uc, tc = ucodes[order], tcodes[order]
        newrun = np.empty(n, bool)
        newrun[0] = True
        newrun[1:] = (uc[1:] != uc[:-1]) | (tc[1:] != tc[:-1])
        rid = np.cumsum(newrun) - 1
        rlen = np.bincount(rid).astype(np.int64)
        ruser = uc[newrun]
        best = np.zeros(len(uuniq), np.int64)
        np.maximum.at(best, ruser, rlen)
        return pd.DataFrame({user_col: uuniq, "max_streak": best})

    return keyed_hash_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        key_of,
        scan,
        partitions=partitions,
    )


def distinct_value_islands(
    ds,
    *,
    key_col: str,
    value_col: str,
    partitions: int = 64,
):
    """Gaps-and-islands over DISTINCT integer values per key — activity
    calendars: the distinct days a user was active, grouped into runs of
    CONSECUTIVE values (day, day+1, ...). Returns one row per key:
    (key, n_values:int64 distinct values, n_islands:int64 runs,
    longest:int64 longest run).

    Differs from :func:`longest_streak` (identical-value runs over the
    ROW sequence): here the islands live on the deduplicated VALUE axis
    — the ``day - ROW_NUMBER()`` grouping trick in SQL.

    Distributed shape: ONE hash(key) exchange, per-shard mergesort +
    (key, value) dedupe + one consecutive-difference boundary scan;
    island lengths from one bincount. One output row per key, exact
    int64.
    """

    def key_of(b: pa.Table) -> np.ndarray:
        return (
            b.column(key_col).to_numpy(zero_copy_only=False).view(np.uint64)
            * _GOLD
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=np.int64),
                    "n_values": pd.Series([], dtype=np.int64),
                    "n_islands": pd.Series([], dtype=np.int64),
                    "longest": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values([key_col, value_col], kind="mergesort")
        g = g.drop_duplicates([key_col, value_col])
        keys = g[key_col].to_numpy(np.int64)
        v = g[value_col].to_numpy(np.int64)
        n = len(g)
        brk = np.empty(n, bool)
        brk[0] = True
        brk[1:] = (keys[1:] != keys[:-1]) | (v[1:] != v[:-1] + 1)
        isl = np.cumsum(brk) - 1
        lengths = np.bincount(isl).astype(np.int64)
        isl_key = keys[np.flatnonzero(brk)]  # key of each island's start
        per = pd.DataFrame({key_col: isl_key, "len": lengths}).groupby(
            key_col, as_index=False, sort=False
        ).agg(
            n_values=("len", "sum"),
            n_islands=("len", "size"),
            longest=("len", "max"),
        )
        for c in ("n_values", "n_islands", "longest"):
            per[c] = per[c].astype(np.int64)
        return per

    return keyed_hash_agg(ds, key_of, scan, partitions=partitions)


def ngram_path_counts(
    ds,
    *,
    user_col: str,
    order_cols: list[str],
    type_col: str,
    n: int = 3,
    partitions: int = 64,
):
    """Consecutive n-step path counts — the transition_matrix bigram
    generalized to length-``n`` windows (trigram user journeys, the
    PrefixSpan depth-n slice for CONSECUTIVE patterns). Same distributed
    shape: ONE hash(user) exchange, per-shard mergesort + factorize +
    one bincount over base-K window codes (all n-1 user-equality masks
    ANDed); each shard emits at most K^n partial rows (guarded), so the
    merge is vocabulary-bounded, never event-bounded.

    Returns (t1..tn, cnt:int64) rows, globally merged and sorted.
    """

    def key_of(b: pa.Table) -> np.ndarray:
        return (
            b.column(user_col).to_numpy(zero_copy_only=False).view(np.uint64)
            * _GOLD
        )

    cols = [f"t{i + 1}" for i in range(n)]

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {**{c: pd.Series([], dtype=object) for c in cols},
             "cnt": pd.Series([], dtype=np.int64)}
        )
        if len(g) < n:
            return empty
        g = g.sort_values([user_col, *order_cols], kind="mergesort")
        users = g[user_col].to_numpy()
        types, codes = np.unique(g[type_col].to_numpy(), return_inverse=True)
        k = len(types)
        if k ** n > 16_000_000:
            raise ValueError(f"type vocabulary too large for n={n}: K={k}")
        m = len(g) - n + 1
        same = np.ones(m, bool)
        for j in range(1, n):
            same &= users[j : j + m] == users[:m]
        if not same.any():
            return empty
        win = np.zeros(m, np.int64)
        for j in range(n):
            win = win * k + codes[j : j + m]
        counts = np.bincount(win[same], minlength=k ** n).astype(np.int64)
        nz = np.flatnonzero(counts)
        out = {}
        rem = nz.copy()
        for j in range(n - 1, -1, -1):
            out[cols[j]] = types[rem % k]
            rem = rem // k
        out["cnt"] = counts[nz]
        return pd.DataFrame(out)[cols + ["cnt"]]

    parts = keyed_hash_agg(ds, key_of, scan, partitions=partitions).to_pandas()
    m = (
        parts.groupby(cols, as_index=False)["cnt"]
        .sum()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    m["cnt"] = m["cnt"].astype(np.int64)
    return m
