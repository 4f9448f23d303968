"""Distributed 2-D skyline (Pareto frontier) — maximal rows under
coordinatewise dominance.

A row t is DOMINATED iff some row u has ``u.x >= t.x AND u.y >= t.y`` with
at least one strict inequality; the skyline is every non-dominated row
(duplicates of a surviving point all survive — no strict inequality
between equals). The curation use: pick documents Pareto-optimal in
(quality, length), suppliers optimal in (price, volume), hosts optimal in
(yield, politeness headroom) — any two-signal "best tradeoff" selection.

Scale shape (the classic distribute-then-merge skyline, e.g. the
MR-skyline family): the skyline operator is ALGEBRAIC — skyline(A ∪ B) =
skyline(skyline(A) ∪ skyline(B)) — so

1. *local prune* (``map_batches``): each batch keeps only its own skyline
   via one vectorized lexsort + group-running-max scan, no Python row
   loop. On real (correlated) data this collapses a batch to a handful
   of candidate rows before anything crosses the wire.
2. *merge*: the surviving candidates union into one final block
   (``repartition(1)``) and the same scan runs once more.

The merge stage sees O(sum of per-block skyline sizes). On
anti-correlated adversarial data the skyline can be O(n) and no
partitioning scheme saves it (the output itself is O(n)); for the
designed-for case (bounded skyline) the merge input is tiny. The scan is
deterministic and purely comparative, so the result is exactly the SQL
dominance definition row-for-row (the ``skyline`` oracle mirrors it with
a per-x-group max + running max window — no quadratic NOT EXISTS).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of non-dominated rows, both dims maximized.

    Sort by x desc then y desc; a point survives iff its y strictly
    exceeds the best y of every strictly-greater-x group AND it ties the
    max y within its own x group (equal-x, lower-y rows are dominated;
    exact duplicates of a surviving point all survive).
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-y, -x))  # x desc, y desc within x
    xs, ys = x[order], y[order]
    new_x = np.r_[True, xs[1:] != xs[:-1]]
    gid = np.cumsum(new_x) - 1
    group_top_y = ys[new_x]  # max y per x group (y desc within group)
    prev_best = np.r_[np.iinfo(np.int64).min, np.maximum.accumulate(group_top_y)[:-1]]
    keep_sorted = (ys == group_top_y[gid]) & (ys > prev_best[gid])
    mask = np.zeros(n, bool)
    mask[order] = keep_sorted
    return mask


def _prune(batch: pa.Table, x_col: str, y_col: str) -> pa.Table:
    x = batch.column(x_col).to_numpy(zero_copy_only=False)
    y = batch.column(y_col).to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(_skyline_mask(x, y)))


def skyline2d(ds, *, x_col: str, y_col: str):
    """Skyline of a Dataset over two numeric columns, both MAXIMIZED
    (negate a column upstream to minimize it). Returns the surviving rows
    with all their columns; duplicate rows of a surviving (x, y) point
    all survive, matching the SQL dominance definition exactly."""

    local = ds.map_batches(
        lambda b: _prune(b, x_col, y_col), batch_format="pyarrow"
    )
    # the candidates are the per-block skylines — merge them in one block
    return local.repartition(1).map_batches(
        lambda b: _prune(b, x_col, y_col), batch_format="pyarrow"
    )
