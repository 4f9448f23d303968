"""Fetch-transport interface (round-4 verdict #3): the A2/A3 fetch
semantics factored behind a small protocol so a user can point the crawl
at a real network without editing ``stages/fetch.py``.

The reference's fetcher (``Fetcher.scala:74-188``) has four behaviors a
transport must reproduce, whatever the wire:

1. **No redirect following for pages** — 3xx statuses are REPORTED with
   their ``Location`` header; the crawl's candidate chain re-enters the
   target (``Fetcher.scala:116-131``). (Robots fetching follows up to 5
   redirects — that lives in ``state/hosts.RobotsFetchSim`` and is a
   different gate.)
2. **Body size cap** (``Fetcher.scala:168-170``, reference.conf's 1 MB
   ``max-content-length``): an oversize download is ABORTED, the body
   dropped, and the row flagged ``length_exceeded`` — the page is
   consumed but never parsed.
3. **Status classes**: transport-level failures (timeout, refused, DNS)
   must not kill the wave — they map to a synthetic status 0 row (html
   NULL), mirroring the reference's failure consumer
   (``FetchResultConsumer.scala:29-50``).
4. **Per-stream bandwidth throttle** (``Fetcher.scala:144``): each
   concurrent fetcher paces its reads to ``bytes_per_sec`` with a token
   bucket; the CLUSTER-level split is the stage's concurrency cap
   (``CrawlConfig.total_bandwidth_budget_bps`` — E2).

Output contract — every transport returns the FETCHED SCHEMA of
``stages/fetch._emit_fetched``::

    url string, depth int32, status int32, content_type string,
    location string, x_robots_tag string, html binary,
    length_exceeded bool

Deployment shape: a transport is a callable CLASS instance used inside
``map_batches(TransportFetchStage(...), concurrency=N)`` over the wave's
selected ``(url, depth)`` rows — an ACTOR POOL, so per-actor state
(connection pools, the corpus row-group index, token buckets) builds
once in ``__init__``, not per batch.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64

FETCHED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("location", pa.string()),
        ("x_robots_tag", pa.string()),
        ("html", pa.binary()),
        ("length_exceeded", pa.bool_()),
    ]
)

#: synthetic status for transport-level failures (timeout, refused, DNS)
STATUS_TRANSPORT_ERROR = 0


class FetchTransport:
    """Protocol: map one batch of urls+depths to fetched rows.

    Implementations must be constructible inside a Ray actor
    (``__init__`` may do expensive setup — it runs once per actor) and
    ``fetch`` must be retry-pure: the same input batch yields the same
    rows (required for Ray task retries; a live-web transport is only
    as pure as the web, which the reference accepts too)."""

    def fetch(self, urls: list[str], depths: np.ndarray) -> pa.Table:
        raise NotImplementedError


class CorpusTransport(FetchTransport):
    """The default (sandbox) transport: the "web" is the hashed corpus
    layout, fetched O(selected) — per batch, the urls hash, the per-actor
    row-group index (built once from parquet footers in ``__init__``)
    plans the touched row groups, and the shared pruned-read kernel
    (``fetch._read_item_fetched``) membership-filters them. Semantics
    (cap, redirect reporting, 404-by-absence) are identical to the fused
    wave path — parity-tested in tests/test_transport.py."""

    def __init__(self, hashed_dir: str, max_content_length: int | None = None):
        from abwcf_ray.stages.fetch import _hashed_index

        self.hashed_dir = str(hashed_dir)
        self.max_content_length = max_content_length
        # build the row-group index ONCE per actor (footer reads)
        self._index = _hashed_index(self.hashed_dir)

    def fetch(self, urls: list[str], depths: np.ndarray) -> pa.Table:
        from abwcf_ray.stages.fetch import (
            _read_item_fetched,
            empty_fetched_table,
        )

        if not urls:
            return empty_fetched_table()
        h = hash64(list(urls))
        order = np.argsort(h)
        hs = h[order]
        ds = np.asarray(depths, dtype=np.int32)[order]
        paths, file_ids, rg_ids, mins, maxs = self._index
        if len(mins) == 0:
            return empty_fetched_table()
        lo = np.searchsorted(hs, mins, side="left")
        hi = np.searchsorted(hs, maxs, side="right")
        hit = lo < hi
        outs = []
        for f_id in np.unique(file_ids[hit]):
            rgs = rg_ids[hit & (file_ids == f_id)]
            outs.append(
                _read_item_fetched(
                    paths[int(f_id)], [int(r) for r in rgs], hs, ds,
                    self.max_content_length,
                )
            )
        if not outs:
            return empty_fetched_table()
        return pa.concat_tables(outs)


class _TokenBucket:
    """Byte-rate pacer (Fetcher.scala:144 per-stream throttle): take(n)
    sleeps just enough to keep the long-run rate at ``rate_bps``."""

    def __init__(self, rate_bps: float):
        self.rate = float(rate_bps)
        self.available = float(rate_bps)  # one second of burst
        self.t_last = time.monotonic()

    def take(self, n: int) -> None:
        if self.rate <= 0:
            return
        now = time.monotonic()
        self.available = min(
            self.rate, self.available + (now - self.t_last) * self.rate
        )
        self.t_last = now
        self.available -= n
        if self.available < 0:
            time.sleep(-self.available / self.rate)


class HTTPTransport(FetchTransport):
    """Real-network transport over stdlib ``http.client`` — the
    skeleton a production deployment would swap in (the sandbox has no
    outbound network; tests drive it against a localhost fixture
    server). One instance per actor: connections pool per (scheme,
    authority), reads stream in 64 KiB chunks through the token bucket,
    and the body cap ABORTS mid-download (connection dropped, flag set)
    exactly like the reference's aborted entity
    (``Fetcher.scala:168-170``).

    Redirects are NOT followed (contract #1): 3xx rows carry the
    ``Location`` header for the candidate chain. Transport failures map
    to ``STATUS_TRANSPORT_ERROR`` rows (contract #3)."""

    CHUNK = 65536

    def __init__(
        self,
        max_content_length: int | None = 1_048_576,
        bytes_per_sec: float = 0.0,
        timeout_s: float = 30.0,
        user_agent: str = "abwcf-ray/1.0",
    ):
        self.max_content_length = max_content_length
        self.bucket = _TokenBucket(bytes_per_sec) if bytes_per_sec else None
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self._conns: dict = {}

    def _conn(self, scheme: str, netloc: str):
        import http.client

        key = (scheme, netloc)
        c = self._conns.get(key)
        if c is None:
            cls = (
                http.client.HTTPSConnection
                if scheme == "https"
                else http.client.HTTPConnection
            )
            c = cls(netloc, timeout=self.timeout_s)
            self._conns[key] = c
        return c

    def _fetch_one(self, url: str):
        """-> (status, content_type, location, x_robots_tag, html,
        length_exceeded)"""
        from urllib.parse import urlsplit

        sp = urlsplit(url)
        target = sp.path or "/"
        if sp.query:
            target += "?" + sp.query
        conn = self._conn(sp.scheme, sp.netloc)
        try:
            conn.request(
                "GET", target, headers={"User-Agent": self.user_agent}
            )
            resp = conn.getresponse()
            status = int(resp.status)
            ctype = resp.getheader("Content-Type")
            location = resp.getheader("Location")
            xrt = resp.getheader("X-Robots-Tag")
            chunks: list[bytes] = []
            total = 0
            exceeded = False
            while True:
                chunk = resp.read(self.CHUNK)
                if not chunk:
                    break
                if self.bucket is not None:
                    self.bucket.take(len(chunk))
                total += len(chunk)
                if (
                    self.max_content_length is not None
                    and total > self.max_content_length
                ):
                    # abort the download: drop the connection rather
                    # than draining an arbitrarily large body
                    exceeded = True
                    conn.close()
                    self._conns.pop((sp.scheme, sp.netloc), None)
                    chunks = []
                    break
                chunks.append(chunk)
            body = None if exceeded else b"".join(chunks)
            return (status, ctype, location, xrt, body, exceeded)
        except Exception:
            # timeout / refused / protocol error: synthetic failure row;
            # drop the (possibly wedged) connection
            self._conns.pop((sp.scheme, sp.netloc), None)
            return (STATUS_TRANSPORT_ERROR, None, None, None, None, False)

    def fetch(self, urls: list[str], depths: np.ndarray) -> pa.Table:
        rows = [self._fetch_one(u) for u in urls]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "depth": pa.array(
                    np.asarray(depths, dtype=np.int32), pa.int32()
                ),
                "status": pa.array([r[0] for r in rows], pa.int32()),
                "content_type": pa.array([r[1] for r in rows], pa.string()),
                "location": pa.array([r[2] for r in rows], pa.string()),
                "x_robots_tag": pa.array([r[3] for r in rows], pa.string()),
                "html": pa.array([r[4] for r in rows], pa.binary()),
                "length_exceeded": pa.array(
                    [r[5] for r in rows], pa.bool_()
                ),
            }
        )


class HTTPRobotsFetcher:
    """A3 over a real network (``RobotsFetcher.scala:56-138``): GET
    ``<host>/robots.txt``, FOLLOW up to ``cfg.robots_max_redirects``
    redirects (robots fetching follows them, unlike page fetching —
    contract #1's exception), truncate the body at
    ``cfg.robots_max_bytes`` (500 KiB default; the reference truncates
    rather than discarding), and report ``(status, hops, body,
    content_type)`` into the SHARED classifier
    (``state/hosts.robots_rows_from_records``) — so the text/plain gate,
    redirect-budget check, status classes and TTLs are byte-identical to
    the corpus sim's. Usable directly as the host-prep ``map_batches``
    stage (same batch contract as ``RobotsFetchSim``)."""

    def __init__(self, cfg, timeout_s: float = 30.0):
        self.cfg = cfg
        self.http = HTTPTransport(max_content_length=None, timeout_s=timeout_s)

    def _record(self, host: str):
        from urllib.parse import urljoin

        url = host.rstrip("/") + "/robots.txt"
        hops = 0
        while True:
            status, ctype, location, _, body, _ = self.http._fetch_one(url)
            if status == STATUS_TRANSPORT_ERROR:
                return (None, hops, None, None)  # unreachable class
            if status in (301, 302, 303, 307, 308):
                hops += 1
                if hops > self.cfg.robots_max_redirects or not location:
                    # over the redirect budget (or a 3xx without a target):
                    # report the hop count; the classifier marks unavailable
                    return (status, hops, None, ctype)
                url = urljoin(url, location)
                continue
            if body is not None and len(body) > self.cfg.robots_max_bytes:
                body = body[: self.cfg.robots_max_bytes]
            # strip any content-type parameters ("text/plain; charset=..")
            if ctype is not None:
                ctype = ctype.split(";", 1)[0].strip()
            return (status, hops, body, ctype)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from abwcf_ray.state.hosts import robots_rows_from_records

        return robots_rows_from_records(self._record, batch, self.cfg)


class TransportFetchStage:
    """Actor-pool stage: ``map_batches(TransportFetchStage(factory),
    concurrency=(lo, hi), batch_size=B)`` over the wave's selected
    ``(url, depth)`` rows. ``factory`` is a zero-arg callable building
    the transport — it runs ONCE per actor in ``__init__`` (connection
    pools / corpus index), per-batch work is just ``transport.fetch``."""

    def __init__(self, factory):
        self.transport = factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        depths = batch.column("depth").to_numpy(zero_copy_only=False)
        return self.transport.fetch(urls, depths)
