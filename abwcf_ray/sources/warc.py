"""WARC 1.0 source/sink — Common-Crawl-style ingestion for the crawl engine.

A minimal, dependency-free WARC reader/writer (the WARC/1.0 format is
header-block + Content-Length-framed payload, ISO 28500). The reader is a
Ray Data pipeline: ``read_binary_files`` over ``*.warc`` shards →
``flat_map``-style ``map_batches`` parsing each shard's ``response``
records into ``pages``-schema rows ``(url, warc_ts, html)``. One task per
shard file — the standard WARC layout (many ~1 GB shards) parallelizes by
file, which is exactly how Common Crawl distributes its corpus.

The writer exports a pages table to WARC shards (used by tests for a
byte-level roundtrip, and by users to interop with WARC tooling).
"""

from __future__ import annotations

from datetime import datetime, timezone
from pathlib import Path

import pyarrow as pa

_CRLF = b"\r\n"


def _format_ts(us: int) -> str:
    dt = datetime.fromtimestamp(us / 1e6, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_ts(s: str) -> int:
    dt = datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1e6)


def write_warc_shard(path: str | Path, rows: list[dict]) -> None:
    """rows: dicts with url, warc_ts (µs int), html (bytes)."""
    with open(path, "wb") as f:
        for r in rows:
            payload = r["html"] or b""
            headers = [
                b"WARC/1.0",
                b"WARC-Type: response",
                b"WARC-Target-URI: " + r["url"].encode(),
                b"WARC-Date: " + _format_ts(int(r["warc_ts"])).encode(),
                b"Content-Type: application/http; msgtype=response",
                b"Content-Length: " + str(len(payload)).encode(),
            ]
            f.write(_CRLF.join(headers) + _CRLF + _CRLF)
            f.write(payload)
            f.write(_CRLF + _CRLF)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """One WARC shard's bytes -> list of (url, warc_ts, html) dicts.
    Non-`response` records are skipped; framing follows Content-Length."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        header_block = data[pos:head_end].decode("utf-8", errors="replace")
        lines = header_block.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            # resync: find the next record marker
            nxt = data.find(b"WARC/1.0", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", "0") or 0)
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        # skip the record-separator CRLFCRLF if present
        if data[pos : pos + 4] == _CRLF + _CRLF:
            pos += 4
        if fields.get("warc-type") != "response":
            continue
        uri = fields.get("warc-target-uri")
        date = fields.get("warc-date")
        if not uri or not date:
            continue
        try:
            ts = _parse_ts(date)
        except ValueError:
            continue
        out.append({"url": uri, "warc_ts": ts, "html": bytes(body)})
    return out


def read_warc(paths: str | list[str]):
    """WARC shards -> Dataset(url: string, warc_ts: timestamp[us],
    html: binary). One parse task per shard file."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=False)

    def parse_batch(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        htmls: list[bytes] = []
        for blob in batch.column("bytes").to_pylist():
            for rec in parse_warc_bytes(blob):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                htmls.append(rec["html"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return ds.map_batches(parse_batch, batch_format="pyarrow", batch_size=1)


def warc_to_corpus(warc_paths, out_dir: str | Path) -> str:
    """Ingest WARC shards into a crawlable pages directory (the engine's
    corpus layout): url, warc_ts, html + fetch-sim columns (status=200,
    text/html; text/lang empty — extraction derives text from html).

    This is the real-Common-Crawl on-ramp: point it at CC WARC shards and
    run the crawl/extraction pipeline over the result."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def to_pages(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "url": batch.column("url"),
                "warc_ts": batch.column("warc_ts"),
                "html": batch.column("html"),
                "text": pa.array([""] * n, pa.string()),
                "lang": pa.array([""] * n, pa.string()),
                "status": pa.array([200] * n, pa.int32()),
                "content_type": pa.array(["text/html"] * n, pa.string()),
                "location": pa.array([None] * n, pa.string()),
                "x_robots_tag": pa.array([None] * n, pa.string()),
            }
        )

    read_warc(warc_paths).map_batches(to_pages, batch_format="pyarrow").write_parquet(
        str(out)
    )
    return str(out)


def write_warc(ds, out_dir: str | Path, rows_per_shard: int = 10_000) -> list[str]:
    """pages Dataset -> WARC shards under out_dir (one shard per input
    block, sharded further by rows_per_shard). Returns shard paths."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid

        rows = [
            {"url": u, "warc_ts": t, "html": h}
            for u, t, h in zip(
                batch.column("url").to_pylist(),
                batch.column("warc_ts").cast(pa.int64()).to_pylist(),
                batch.column("html").to_pylist(),
            )
        ]
        paths = []
        for start in range(0, len(rows), rows_per_shard):
            p = out / f"part-{uuid.uuid4().hex[:12]}.warc"
            write_warc_shard(p, rows[start : start + rows_per_shard])
            paths.append(str(p))
        return pa.table({"path": pa.array(paths, pa.string())})

    paths_tbl = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return sorted(paths_tbl["path"].tolist())
