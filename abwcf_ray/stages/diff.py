"""Snapshot diff (change-data-capture between two keyed table versions).

``snapshot_diff(old, new, key=...)`` returns one row per key whose state
changed between two snapshots of the same logical table: ``change`` ∈
{'added', 'removed', 'changed'}, with the old and new value of every
compared column side by side (``old_<c>`` / ``new_<c>``, null on the
absent side). Unchanged keys are dropped — the output is O(churn), not
O(table), which is the point of CDC at 100 TB: the diff of two crawl
frontiers or two curation runs ships only what moved.

Distributed shape: both snapshots are renamed and tagged map-side, then
co-partitioned by ONE keyed exchange on hash64(key) (the repo's standard
equi-join idiom — reused literally: the outer regime of
``stages.join.equi_join`` already unifies schemas, null-fills the absent
side, and restores exact dtypes); the classify/filter pass after the
join is a stateless vectorized ``map_batches`` — null-safe per-column
compares (``IS DISTINCT FROM`` semantics), no Python row loops.

Contract: ``key`` must be unique per snapshot (a primary key — standard
CDC precondition); duplicate keys would multiply join rows. All compares
are exact (integers/strings/bools compared by value; nulls equal only to
nulls), so a DuckDB FULL OUTER JOIN oracle reproduces the output
row-for-row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.join import equi_join

_PRESENT_OLD = "_old_present"
_PRESENT_NEW = "_new_present"


def snapshot_diff(
    old,
    new,
    *,
    key: str,
    compare_cols: list[str],
    partitions: int = 64,
):
    """Diff two snapshot Datasets sharing ``key`` + ``compare_cols``.

    Returns a Dataset with columns
    ``[key, change, old_<c>..., new_<c>...]`` containing only added /
    removed / changed keys (null-safe compare per column).
    """

    def prep(side: str):
        ren = {c: f"{side}_{c}" for c in compare_cols}
        flag = _PRESENT_OLD if side == "old" else _PRESENT_NEW

        def f(t: pa.Table) -> pa.Table:
            cols = {key: t.column(key)}
            for c in compare_cols:
                cols[ren[c]] = t.column(c)
            cols[flag] = pa.array(np.ones(t.num_rows, np.int8))
            return pa.table(cols)

        return f

    o = old.map_batches(prep("old"), batch_format="pyarrow")
    n = new.map_batches(prep("new"), batch_format="pyarrow")
    joined = equi_join(o, n, on=key, how="outer", partitions=partitions)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        has_old = df[_PRESENT_OLD].notna()
        has_new = df[_PRESENT_NEW].notna()
        differs = np.zeros(len(df), bool)
        for c in compare_cols:
            a, b = df[f"old_{c}"], df[f"new_{c}"]
            # IS DISTINCT FROM: differ unless equal or both null (a
            # one-sided null compares NA under nullable dtypes — fill
            # to False so it lands in the "distinct" branch)
            eq = a.eq(b)
            if eq.dtype != bool:
                eq = eq.fillna(False).astype(bool)
            differs |= (~eq & ~(a.isna() & b.isna())).to_numpy(bool)
        change = np.where(
            ~has_old, "added", np.where(~has_new, "removed", "changed")
        )
        keep = (~has_old | ~has_new | differs).to_numpy()
        out = df.loc[
            keep,
            [key]
            + [f"old_{c}" for c in compare_cols]
            + [f"new_{c}" for c in compare_cols],
        ].copy()
        out.insert(1, "change", change[keep])
        # absent-side object cells come out of the merge as float NaN;
        # canonicalize to None so arrow/driver compares see real nulls
        for c in out.columns:
            if out[c].dtype == object:
                out[c] = out[c].where(out[c].notna(), None)
        return out

    return joined.map_batches(classify, batch_format="pandas")
