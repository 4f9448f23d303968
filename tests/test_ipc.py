"""Arrow IPC source/sink (sources/ipc.py): byte-exact roundtrip,
content-hash part naming (idempotent retries), corrupt-shard tolerance,
strict mode."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from abwcf_ray.sources.ipc import read_ipc, write_ipc


def _df(n=200, seed=4):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [f"doc {i} " + "x" * int(rng.integers(0, 30)) for i in range(n)],
            "score": rng.random(n),
        }
    )


def test_ipc_roundtrip_exact(ray_session, tmp_path):
    df = _df()
    out = str(tmp_path / "shards")
    n_shards = write_ipc(rd.from_pandas(df).repartition(5), out)
    assert n_shards == 5
    back = (
        read_ipc(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df)


def test_ipc_write_idempotent_names(ray_session, tmp_path):
    df = _df(50)
    out = str(tmp_path / "shards")
    write_ipc(rd.from_pandas(df).repartition(3), out)
    first = sorted(os.listdir(out))
    # identical content rewrites the identical files (retry semantics)
    write_ipc(rd.from_pandas(df).repartition(3), out)
    assert sorted(os.listdir(out)) == first


def test_ipc_corrupt_shard_tolerated_and_strict(ray_session, tmp_path):
    df = _df(60)
    out = str(tmp_path / "shards")
    write_ipc(rd.from_pandas(df).repartition(2), out)
    with open(os.path.join(out, "zz-corrupt.arrow"), "wb") as f:
        f.write(b"ARROW1\x00\x00garbage-not-a-footer")
    back = read_ipc(out).to_pandas()
    assert len(back) == 60  # corrupt shard contributes zero rows
    with pytest.raises(Exception):
        read_ipc(out, strict=True).materialize()


def test_ipc_missing_dir_raises(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_ipc(str(tmp_path / "nope"))


def test_ipc_reader_ignores_tmp_orphans(ray_session, tmp_path):
    """A crashed writer's orphaned .tmp file (complete, valid IPC bytes)
    must not be re-read as a shard — only *.arrow files count."""
    df = _df(40)
    out = str(tmp_path / "shards")
    write_ipc(rd.from_pandas(df).repartition(2), out)
    shard = next(f for f in os.listdir(out) if f.endswith(".arrow"))
    with open(os.path.join(out, shard), "rb") as f:
        raw = f.read()
    with open(os.path.join(out, f"{shard}.999.tmp"), "wb") as f:
        f.write(raw)  # valid IPC bytes under a tmp name
    assert len(read_ipc(out).to_pandas()) == 40


def test_ipc_duplicate_blocks_raise(ray_session, tmp_path):
    """Two byte-identical blocks cannot be content-addressed apart; the
    sink raises instead of silently collapsing them."""
    df = pd.DataFrame({"x": [1, 2, 3]})
    both = pd.concat([df, df], ignore_index=True)
    ds = rd.from_pandas(both).repartition(2)  # two identical blocks
    with pytest.raises(ValueError, match="byte-identical"):
        write_ipc(ds, str(tmp_path / "dup"))
