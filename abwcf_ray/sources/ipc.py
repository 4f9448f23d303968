"""Arrow IPC (Feather v2) source/sink — the zero-parse interchange
format completing the connector family (parquet, CSV, JSONL, WARC).
IPC files carry the Arrow schema and columnar buffers verbatim, so a
read is a memory-map-shaped decode with NO type coercion layer: the
write side's schema IS the read side's schema.

Scale shape mirrors the other connectors:

- **Sink**: one file per input block, streamed (never a driver
  collect); part names are the 64-bit blake2 content hash of the
  serialized bytes, so a retried task rewrites the IDENTICAL file —
  idempotent, resumable output (the fetch-tee retry-safe-naming
  contract). Content addressing preserves block multiplicity iff no
  two blocks are byte-identical — guaranteed whenever any column is
  row-unique (doc_id / url, as in every table here); the sink VERIFIES
  this (duplicate part paths raise instead of silently collapsing).
- **Source**: one read task per shard (the CC per-file-parallelism
  layout, no shuffle); only ``*.arrow`` files are considered, so
  orphaned ``*.tmp`` files from a crashed writer are never re-read.
  ``strict=False`` tolerates a corrupt/truncated shard to zero rows,
  with a warning printed to the task log (visible via Ray's worker
  logs); ``strict=True`` re-raises.
"""

from __future__ import annotations

import os

import pyarrow as pa

from abwcf_ray.sources.csv_src import _shard_paths


def write_ipc(ds, out_dir: str) -> int:
    """Write a Dataset as Arrow IPC file shards under ``out_dir`` (one
    ``part-<contenthash>.arrow`` per block, deterministic names).
    Returns the number of shards written. Streaming: each block
    serializes and lands inside its own task; nothing funnels through
    the driver. Raises ``ValueError`` if two distinct blocks were
    byte-identical (content addressing cannot preserve their
    multiplicity — give the data a row-unique column)."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, batch.schema) as w:
            w.write_table(batch)
        import hashlib

        raw = sink.getvalue().to_pybytes()
        h = hashlib.blake2b(raw, digest_size=8).hexdigest()
        path = os.path.join(out_dir, f"part-{h}.arrow")
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(raw)
        os.replace(tmp, path)  # atomic: concurrent retry writes same bytes
        return pa.table({"path": pa.array([path], pa.string())})

    # the path table is tiny (one row per block): collect it to verify no
    # two blocks collapsed onto one content-addressed file
    paths = [
        r["path"]
        for r in ds.map_batches(
            dump, batch_format="pyarrow", batch_size=None
        ).take_all()
    ]
    if len(set(paths)) != len(paths):
        raise ValueError(
            "write_ipc: two byte-identical blocks mapped to one "
            "content-addressed shard; add a row-unique column to keep "
            "block multiplicity"
        )
    return len(paths)


def read_ipc(paths, *, strict: bool = False):
    """Read Arrow IPC shard(s) into a Dataset; one task per shard.
    ``strict=False`` tolerates unreadable shards to zero rows (a warning
    goes to the reading task's log); ``strict=True`` re-raises. All
    shards must share one schema (the sink guarantees it; mixed-schema
    directories raise at union time)."""
    import ray.data as rd

    files = [
        f
        for f in _shard_paths(paths)
        if os.path.isfile(f) and f.endswith(".arrow")
    ]
    if not files:
        raise FileNotFoundError(f"no IPC shards under {paths!r}")

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("path").to_pylist():
            try:
                with pa.ipc.open_file(pa.memory_map(p, "r")) as r:
                    out.append(r.read_all())
            except (pa.ArrowInvalid, pa.ArrowIOError, OSError) as e:
                if strict:
                    raise
                print(f"read_ipc: skipping unreadable shard {p}: {e}")
        if not out:
            return None  # resolved below: empty against the good schema
        return pa.concat_tables(out, promote_options="none")

    # schema probe from the first READABLE shard so empty/corrupt blocks
    # return typed empties
    probe = None
    for p in files:
        try:
            with pa.ipc.open_file(pa.memory_map(p, "r")) as r:
                probe = r.schema
            break
        except (pa.ArrowInvalid, pa.ArrowIOError, OSError):
            if strict:
                raise
    if probe is None:
        raise ValueError(f"no readable IPC shard under {paths!r}")
    empty = probe.empty_table()

    def load_typed(batch: pa.Table) -> pa.Table:
        t = load(batch)
        return empty if t is None else t

    return rd.from_items(
        [{"path": p} for p in files]
    ).map_batches(load_typed, batch_format="pyarrow", batch_size=1)
