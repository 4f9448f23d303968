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
