"""Malformed-tolerant JSONL source.

Web-scale text dumps ship as JSON-lines with a real defect rate
(truncated tails from killed writers, interleaved garbage, encoding
damage). Ray's native ``read_json`` fails the whole task on the first
bad line — at 100 TB that's a crashed job three days in. This source
reads shards as text lines (``read_text``: per-shard parallel, streaming
blocks) and parses per batch with per-line tolerance: bad lines count
into a ``_bad_lines`` side table instead of raising, and rows coerce to
an explicit caller schema (missing fields -> null, wrong types -> null,
extra fields dropped) so the output schema never drifts on discovered
values — the same no-mid-pipeline-widening contract as stages/pivot.py.

Scale shape: one map pass, zero shuffle; schema coercion is per-batch
columnar assembly (Python-loop JSON parse is unavoidable — the stdlib
parser is the hot path and is gated behind batch-level fast paths).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


def read_jsonl(
    paths,
    *,
    schema: dict[str, pa.DataType],
    strict: bool = False,
):
    """Read JSONL shard(s) into a Dataset with EXACTLY the columns of
    ``schema`` plus ``_bad`` (int64: 1 for a malformed line — kept as a
    countable tombstone so data loss is observable, not silent; filter
    ``_bad == 0`` for the clean view). ``strict=True`` raises on the
    first malformed line instead."""
    import ray.data as rd

    names = list(schema)

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        cols: dict[str, list] = {c: [] for c in names}
        bad = np.zeros(len(lines), np.int64)
        for i, ln in enumerate(lines):
            try:
                obj = json.loads(ln)
                if not isinstance(obj, dict):
                    raise ValueError("not an object")
            except Exception:
                if strict:
                    raise
                bad[i] = 1
                for c in names:
                    cols[c].append(None)
                continue
            for c in names:
                cols[c].append(obj.get(c))
        out: dict[str, pa.Array] = {}
        for c in names:
            try:
                out[c] = pa.array(cols[c], type=schema[c])
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                # wrong-typed values -> null per row, keep the line
                vals = []
                for v in cols[c]:
                    try:
                        pa.array([v], type=schema[c])
                        vals.append(v)
                    except (pa.ArrowInvalid, pa.ArrowTypeError):
                        vals.append(None)
                out[c] = pa.array(vals, type=schema[c])
        out["_bad"] = pa.array(bad, pa.int64())
        return pa.table(out)

    return rd.read_text(paths).map_batches(parse, batch_format="pyarrow")
