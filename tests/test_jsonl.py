"""Malformed-tolerant JSONL source (sources/jsonl.py)."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from abwcf_ray.sources.jsonl import read_jsonl

SCHEMA = {"doc_id": pa.int64(), "text": pa.string(), "score": pa.float64()}


def _write(tmp_path, lines, name="a.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_roundtrip(ray_session, tmp_path):
    rows = [{"doc_id": i, "text": f"t{i}", "score": i / 2} for i in range(50)]
    p = _write(tmp_path, [json.dumps(r) for r in rows])
    got = (
        read_jsonl([p], schema=SCHEMA)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["_bad"].sum() == 0
    assert got["doc_id"].tolist() == list(range(50))
    assert got["text"].tolist() == [f"t{i}" for i in range(50)]


def test_malformed_lines_tolerated_and_counted(ray_session, tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "ok"}),
        "{truncated",
        "[1,2,3]",  # not an object
        json.dumps({"doc_id": 2, "extra": "dropped"}),
        "",  # blank lines are dropped by read_text before the parser
    ]
    p = _write(tmp_path, lines)
    got = read_jsonl([p], schema=SCHEMA).to_pandas()
    assert len(got) == 4
    assert int(got["_bad"].sum()) == 2
    clean = got[got["_bad"] == 0]
    assert sorted(clean["doc_id"].dropna().astype(int)) == [1, 2]
    # missing fields -> null, extra fields dropped, schema fixed
    assert list(got.columns) == ["doc_id", "text", "score", "_bad"]
    assert clean.loc[clean["doc_id"] == 2, "text"].isna().all()


def test_wrong_typed_field_nulls_not_drops(ray_session, tmp_path):
    lines = [
        json.dumps({"doc_id": "not-an-int", "text": "kept"}),
        json.dumps({"doc_id": 7, "text": "fine"}),
    ]
    p = _write(tmp_path, lines)
    got = read_jsonl([p], schema=SCHEMA).to_pandas()
    assert int(got["_bad"].sum()) == 0
    kept = got[got["text"] == "kept"]
    assert len(kept) == 1 and kept["doc_id"].isna().all()


def test_strict_raises(ray_session, tmp_path):
    p = _write(tmp_path, ["{bad"])
    with pytest.raises(Exception):
        read_jsonl([p], schema=SCHEMA, strict=True).materialize()
