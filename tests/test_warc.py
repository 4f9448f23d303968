"""WARC source/sink roundtrip tests."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pads

from abwcf_ray.sources.warc import parse_warc_bytes, read_warc, write_warc, write_warc_shard


def test_shard_roundtrip(tmp_path):
    rows = [
        {"url": "https://a.example/1", "warc_ts": 1_700_000_000_000_000, "html": b"<html>1</html>"},
        {"url": "https://a.example/2", "warc_ts": 1_700_000_001_000_000, "html": b""},
        {"url": "https://b.example/x", "warc_ts": 1_700_000_002_000_000, "html": b"bin\r\n\r\ndata"},
    ]
    p = tmp_path / "t.warc"
    write_warc_shard(p, rows)
    got = parse_warc_bytes(p.read_bytes())
    assert got == rows


def test_skips_non_response_records(tmp_path):
    p = tmp_path / "t.warc"
    payload = b"junk"
    content = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\njunk\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/\r\n"
        b"WARC-Date: 2025-01-01T00:00:00Z\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    p.write_bytes(content)
    got = parse_warc_bytes(p.read_bytes())
    assert len(got) == 1 and got[0]["url"] == "https://x/" and got[0]["html"] == b"hi"


def test_dataset_roundtrip_via_corpus(ray_session, tmp_path):
    """pages corpus -> WARC shards -> Dataset: byte-identical html per url."""
    import ray.data as rd

    from abwcf_ray.sources.corpus import generate_corpus

    meta = generate_corpus(tmp_path / "c", n_pages=300, seed=42, num_buckets=4)
    pages = rd.read_parquet(meta.pages_dir, columns=["url", "warc_ts", "html"])
    paths = write_warc(pages, tmp_path / "warc", rows_per_shard=100)
    assert len(paths) >= 3
    back = read_warc(paths).to_pandas().sort_values("url").reset_index(drop=True)
    orig = (
        pads.dataset(meta.pages_dir)
        .to_table(columns=["url", "warc_ts", "html"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert back["url"].tolist() == orig["url"].tolist()
    assert (back["html"] == orig["html"]).all()
    # WARC-Date is second-granular; timestamps agree at second resolution
    assert (
        back["warc_ts"].astype("int64") // 10**6
        == orig["warc_ts"].astype("int64") // 10**6
    ).all()


def test_warc_to_corpus_is_crawlable(ray_session, tmp_path):
    """WARC shards -> corpus layout the fetch scan can consume."""
    import ray.data as rd

    from abwcf_ray.sources.corpus import generate_corpus
    from abwcf_ray.sources.warc import warc_to_corpus, write_warc

    meta = generate_corpus(tmp_path / "c", n_pages=200, seed=42, num_buckets=4)
    pages = rd.read_parquet(meta.pages_dir, columns=["url", "warc_ts", "html"])
    shards = write_warc(pages, tmp_path / "warc", rows_per_shard=100)
    pages_dir = warc_to_corpus(shards, tmp_path / "ingested")
    t = pads.dataset(pages_dir).to_table()
    assert t.num_rows == 200
    assert set(t.schema.names) >= {
        "url", "warc_ts", "html", "status", "content_type", "location", "x_robots_tag"
    }
    # the fetch scan consumes it directly
    from abwcf_ray.stages.fetch import FETCH_COLUMNS, make_fetch_scan, make_selection_ref
    import numpy as np

    urls = t.column("url").to_pylist()[:50]
    ref = make_selection_ref(urls, np.zeros(50, dtype=np.int32))
    fetched = (
        rd.read_parquet(pages_dir, columns=FETCH_COLUMNS)
        .map_batches(make_fetch_scan(ref), batch_format="pyarrow")
        .to_pandas()
    )
    assert sorted(fetched["url"]) == sorted(urls)
    assert (fetched["status"] == 200).all()


def test_truncated_and_corrupt_shards():
    """Reader resyncs past garbage and tolerates truncation mid-record."""
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/\r\n"
        b"WARC-Date: 2025-01-01T00:00:00Z\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    assert parse_warc_bytes(b"garbage bytes\r\n\r\nmore junk" + good)[0]["url"] == "https://x/"
    # truncated second record: first still parses, no crash
    out = parse_warc_bytes(good + b"WARC/1.0\r\nWARC-Type: resp")
    assert len(out) == 1
    # record with bad date skipped
    bad_date = good.replace(b"2025-01-01T00:00:00Z", b"not-a-date-at-allz")
    assert parse_warc_bytes(bad_date) == []
