"""Malformed-tolerant CSV source — garbage-shard roundtrip semantics."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def test_csv_tolerant_roundtrip_with_garbage(ray_session, tmp_path):
    import ray.data as rd

    from abwcf_ray.sources.csv_src import read_csv_tolerant

    d = str(tmp_path / "shards")
    os.makedirs(d)
    clean = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "text": [f"row {i} text, with comma" for i in range(10)],
            "n": np.arange(10, dtype=np.int64) * 7,
        }
    )
    clean.to_csv(f"{d}/a.csv", index=False)
    with open(f"{d}/b.csv", "w") as f:
        f.write("doc_id,text,n\n")
        f.write("100,good row,5\n")
        f.write("1,too,many,cols,here\n")       # wrong arity -> skipped
        f.write("bad_id,type damaged,9\n")       # doc_id -> null, row kept
        f.write("101,another good,6\n")
    with open(f"{d}/c.csv", "wb") as f:
        f.write(b"\x01\x02\xff binary junk, not csv at all \xfe\n\x00")

    schema = {"doc_id": pa.int64(), "text": pa.string(), "n": pa.int64()}
    out = read_csv_tolerant(d, schema=schema).to_pandas()

    # whole-shard failure (c.csv) leaves exactly one -1 tombstone row
    tomb = out[out["_bad_rows"] == -1]
    assert len(tomb) == 1 and tomb["doc_id"].isna().all()

    rows = out[out["_bad_rows"] >= 0]
    # b.csv: 3 surviving rows (one with null doc_id), 1 skipped
    b_rows = rows[rows["_bad_rows"] == 1]
    assert len(b_rows) == 3
    assert b_rows["doc_id"].isna().sum() == 1
    assert set(b_rows["doc_id"].dropna().astype(np.int64)) == {100, 101}

    # a.csv: all 10 rows intact, text (with commas) byte-identical
    a_rows = rows[rows["_bad_rows"] == 0].sort_values("doc_id")
    assert a_rows["doc_id"].astype(np.int64).tolist() == list(range(10))
    assert a_rows["text"].tolist() == clean["text"].tolist()
    assert a_rows["n"].astype(np.int64).tolist() == clean["n"].tolist()


def test_csv_tolerant_strict_raises(ray_session, tmp_path):
    import pytest
    import ray

    from abwcf_ray.sources.csv_src import read_csv_tolerant

    d = str(tmp_path / "s")
    os.makedirs(d)
    with open(f"{d}/x.csv", "w") as f:
        f.write("a,b\n1,2\n3,4,5\n")
    schema = {"a": pa.int64(), "b": pa.int64()}
    with pytest.raises(Exception):
        read_csv_tolerant(d, schema=schema, strict=True).materialize()
