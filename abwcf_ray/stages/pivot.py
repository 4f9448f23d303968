"""PIVOT (wide conditional aggregation) and UNPIVOT (melt).

``pivot_counts``: one row per group, one count column per category —
the SQL ``COUNT(*) FILTER (WHERE cat = ...)`` family. The distributed
shape is the standard combiner + keyed merge: map-side, each batch
reduces to per-(group, category) partial counts laid out WIDE (a
len(categories)-column int64 matrix via bincount on the composite code
— already the output schema, so the exchange carries one slim row per
distinct group per batch), then ONE hash(group)-keyed merge sums the
partials. Categories must be enumerated by the caller (the engine never
schema-widens mid-pipeline on discovered values; run a distinct pass
first if unknown). Unknown categories fall into ``other_col`` if given,
else are dropped.

``unpivot``: the inverse map-side melt — no shuffle at all, each wide
row explodes to (group, category, value) rows inside its batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import keyed_hash_agg


def _gkey(b: pa.Table, col: str) -> np.ndarray:
    c = b.column(col)
    if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
        return hash64(c)
    return c.to_numpy(zero_copy_only=False).astype(np.int64)


def pivot_counts(
    ds,
    *,
    group_col: str,
    pivot_col: str,
    categories: list[str],
    other_col: str | None = None,
    merge_partitions: int = 64,
):
    """Count rows per (group, category) laid out wide: returns a Dataset
    with ``group_col`` + one int64 ``n_<category>`` column each (+
    ``n_<other_col>`` for values outside ``categories`` if set)."""
    cats = list(categories)
    cols = [f"n_{c}" for c in cats] + ([f"n_{other_col}"] if other_col else [])
    ncat = len(cats) + (1 if other_col else 0)

    def partial(t: pa.Table) -> pa.Table:
        pv = t.column(pivot_col).to_pandas().astype(str)
        code = pd.Categorical(pv, categories=cats).codes.astype(np.int64)
        if other_col:
            code[code < 0] = len(cats)
        keep = code >= 0
        gv = t.column(group_col).to_pandas()[keep].reset_index(drop=True)
        code = code[keep]
        gcodes, guniq = pd.factorize(gv.to_numpy())
        mat = np.bincount(
            gcodes * ncat + code, minlength=len(guniq) * ncat
        ).reshape(len(guniq), ncat).astype(np.int64)
        out = {group_col: pa.array(guniq)}
        for j, c in enumerate(cols):
            out[c] = pa.array(mat[:, j], pa.int64())
        return pa.table(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(group_col, as_index=False, sort=False)[cols].sum()
        for c in cols:
            out[c] = out[c].astype(np.int64)
        return out

    return keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda b: _gkey(b, group_col),
        merge,
        partitions=merge_partitions,
    )


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable", value_name: str = "value"):
    """Map-side melt: wide -> long, zero shuffle. Value columns must share
    one numeric type."""

    def melt(t: pa.Table) -> pa.Table:
        pdf = t.select(id_cols + value_cols).to_pandas()
        out = pdf.melt(
            id_vars=id_cols, value_vars=value_cols,
            var_name=var_name, value_name=value_name,
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(melt, batch_format="pyarrow")
