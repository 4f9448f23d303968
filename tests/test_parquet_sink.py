"""Resumable partitioned-Parquet sink (sources/parquet_sink.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from abwcf_ray.sources.parquet_sink import write_partitioned_parquet


def _frame(n=500, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "host": "h" + pd.Series(rng.integers(0, 40, n)).astype(str),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )


def _read_all(d):
    parts = sorted(d.glob("part-*.parquet"))
    return pd.concat(
        [pq.read_table(p).to_pandas() for p in parts], ignore_index=True
    )


def test_roundtrip_and_partition_count(ray_session, tmp_path):
    import ray.data as rd

    df = _frame()
    res = write_partitioned_parquet(
        rd.from_pandas(df).repartition(5), tmp_path / "out",
        key_col="host", partitions=8, sort_col="id",
    )
    assert res["skipped"] == [] and res["rows"] == len(df)
    assert len(list((tmp_path / "out").glob("part-*.parquet"))) == len(
        res["written"]
    ) <= 8
    back = _read_all(tmp_path / "out")
    pd.testing.assert_frame_equal(
        back.sort_values("id").reset_index(drop=True), df
    )
    # a key's rows all live in one file (the partition contract)
    for p in (tmp_path / "out").glob("part-*.parquet"):
        hosts = set(pq.read_table(p).to_pandas()["host"])
        for q in (tmp_path / "out").glob("part-*.parquet"):
            if p != q:
                assert not hosts & set(pq.read_table(q).to_pandas()["host"])


def test_resume_skips_finished_partitions(ray_session, tmp_path):
    import ray.data as rd

    df = _frame(seed=9)
    out = tmp_path / "out"
    first = write_partitioned_parquet(
        rd.from_pandas(df), out, key_col="host", partitions=8, sort_col="id"
    )
    # delete two partitions to simulate a run killed mid-write
    victims = first["written"][:2]
    for pid in victims:
        (out / f"part-{pid:05d}.parquet").unlink()
    mtimes = {
        p.name: p.stat().st_mtime_ns for p in out.glob("part-*.parquet")
    }
    second = write_partitioned_parquet(
        rd.from_pandas(df), out, key_col="host", partitions=8, sort_col="id"
    )
    assert second["written"] == victims  # only the missing ones rewritten
    assert set(second["skipped"]) == set(first["written"]) - set(victims)
    for p in out.glob("part-*.parquet"):
        if p.name in mtimes:  # survivors untouched byte-for-byte window
            assert p.stat().st_mtime_ns == mtimes[p.name]
    back = _read_all(out)
    pd.testing.assert_frame_equal(
        back.sort_values("id").reset_index(drop=True), df
    )


def test_no_tmp_files_left(ray_session, tmp_path):
    import ray.data as rd

    write_partitioned_parquet(
        rd.from_pandas(_frame(n=60)), tmp_path / "out",
        key_col="host", partitions=4,
    )
    assert not list((tmp_path / "out").glob(".part-*"))
