"""Malformed-tolerant CSV source — the sibling of sources/jsonl.py for
the other ubiquitous dump format. Real CSV corpora carry the same defect
classes (truncated tails, wrong-arity rows from unescaped delimiters,
type damage, binary junk); Ray's native ``read_csv`` fails the task on
the first one. This source reads ONE SHARD PER TASK (the CC layout —
per-file parallelism, no shuffle) through ``pyarrow.csv`` with:

- ``invalid_row_handler='skip'``: wrong-column-count rows drop and
  COUNT (observable, not silent) instead of raising;
- all columns read as STRING then coerced per batch to the caller's
  explicit schema (wrong-typed cells -> null, missing columns -> null,
  extra columns dropped) — the jsonl.py no-schema-drift contract;
- a whole-shard parse failure (binary junk, invalid UTF-8) tolerates to
  zero rows from that shard, counted likewise.

Output columns: exactly the schema plus ``_bad_rows`` (int64, attached
to every surviving row of its shard: skipped + whole-shard-failure row
estimate is NOT knowable per row, so the count is per-shard and
repeated — aggregate with max() per shard path or just sum distinct;
the tests pin the exact semantics).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa


def _shard_paths(paths) -> list[str]:
    if isinstance(paths, (list, tuple)):
        out = []
        for p in paths:
            out.extend(_shard_paths(p))
        return out
    if os.path.isdir(paths):
        return sorted(
            f for f in glob.glob(os.path.join(paths, "*")) if os.path.isfile(f)
        )
    return [paths]


def read_csv_tolerant(
    paths,
    *,
    schema: dict[str, pa.DataType],
    strict: bool = False,
):
    """Read CSV shard(s) into a Dataset with EXACTLY the columns of
    ``schema`` (coerced; bad cells null) plus ``_bad_rows``. One read
    task per shard; ``strict=True`` re-raises every defect instead."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    names = list(schema)
    files = _shard_paths(paths)

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for path in batch.column("path").to_pylist():
            skipped = [0]

            def on_invalid(row):
                skipped[0] += 1
                return "skip"

            try:
                raw = pacsv.read_csv(
                    path,
                    parse_options=pacsv.ParseOptions(
                        invalid_row_handler=None if strict else on_invalid
                    ),
                    convert_options=pacsv.ConvertOptions(
                        column_types={c: pa.string() for c in names}
                    ),
                )
                # header damage (binary junk) can poison the schema's
                # very NAMES — touching them must stay inside the guard
                raw_names = set(raw.schema.names)
                cols: dict[str, pa.Array] = {}
                for c in names:
                    if c in raw_names:
                        col = raw.column(c)
                        if isinstance(col, pa.ChunkedArray):
                            col = col.combine_chunks()
                        try:
                            cols[c] = col.cast(schema[c])
                        except (pa.ArrowInvalid, pa.ArrowTypeError):
                            vals = col.to_pylist()
                            safe = []
                            for v in vals:
                                if v is None:
                                    safe.append(None)
                                    continue
                                try:
                                    safe.append(
                                        pa.array([v], pa.string())
                                        .cast(schema[c])[0]
                                        .as_py()
                                    )
                                except (pa.ArrowInvalid, pa.ArrowTypeError):
                                    safe.append(None)
                            cols[c] = pa.array(safe, type=schema[c])
                    else:
                        cols[c] = pa.nulls(raw.num_rows, schema[c])
                cols["_bad_rows"] = pa.array(
                    np.full(raw.num_rows, skipped[0], np.int64)
                )
                tables.append(pa.table(cols))
            except Exception:
                if strict:
                    raise
                # whole-shard damage: zero rows, one tombstone row so the
                # loss is countable
                tables.append(
                    pa.table(
                        {
                            **{c: pa.nulls(1, schema[c]) for c in names},
                            "_bad_rows": pa.array([-1], pa.int64()),
                        }
                    )
                )
                continue
        if not tables:
            return pa.table(
                {
                    **{c: pa.nulls(0, schema[c]) for c in names},
                    "_bad_rows": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(tables)

    return rd.from_items([{"path": f} for f in files]).map_batches(
        load, batch_format="pyarrow"
    )
