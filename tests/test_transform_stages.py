"""Unit tests for the batch-transform stages, incl. the normalize fast-path
equivalence property."""

from __future__ import annotations

import string

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from abwcf_ray.config import (
    STRICT_NORMALIZATION,
    CrawlConfig,
    NormalizationConfig,
)
from abwcf_ray.functions.urlnorm import normalize_url
from abwcf_ray.stages.transform import (
    _CANONICAL_RE,
    make_normalize_stage,
    make_prioritize_stage,
    make_scope_filter_stage,
)


def _norm_batch(urls, cfg=None):
    stage = make_normalize_stage(cfg or CrawlConfig())
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([1] * len(urls), pa.int32()),
        }
    )
    return stage(t)


def test_normalize_stage_matches_scalar_kernel():
    urls = [
        "https://h1.example/p3",  # fast path
        "HTTPS://H1.EXAMPLE:443/./p3",  # slow path, same canonical
        "https://h2.example/a/b/p7/",  # fast path w/ trailing slash
        "http://exa mple/",  # dropped
        "mailto:x@example.com",  # dropped
        "https://user@h3.example/x?q=1#f",  # slow path
    ]
    out = _norm_batch(urls)
    got = dict(zip(out.column("url").to_pylist(), out.column("host").to_pylist()))
    assert got == {
        "https://h1.example/p3": "https://h1.example",
        "https://h2.example/a/b/p7/": "https://h2.example",
        "https://h3.example/x?q=1": "https://h3.example",
    }


@given(
    st.text(
        alphabet=string.ascii_letters + string.digits + ":/.?#@%-_~[]",
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=300, deadline=None)
def test_normalize_fast_path_agrees(s):
    """Anything the canonical fast-path regex accepts must be a fixed point
    of the full normalizer under EVERY config."""
    url = "https://" + s if not s.startswith("http") else s
    if _CANONICAL_RE.fullmatch(url):
        for cfg in (
            NormalizationConfig(),
            STRICT_NORMALIZATION,
            NormalizationConfig(False, False, False),
        ):
            assert normalize_url(url, cfg) == url


_seg = st.text(alphabet=string.ascii_letters + string.digits + "_-", min_size=1, max_size=8)


@given(
    scheme=st.sampled_from(["http", "https"]),
    host=st.from_regex(r"[a-z0-9][a-z0-9.\-]{0,20}", fullmatch=True),
    segs=st.lists(_seg, min_size=0, max_size=5),
    trailing=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_normalize_fast_path_agrees_dense(scheme, host, segs, trailing):
    """Component-wise generator: every url built from the canonical grammar
    (which the fast-path regex accepts by construction) is a fixed point of
    the full normalizer — dense coverage of the fast-path surface, incl.
    trailing slashes."""
    path = "/" + "/".join(segs) + ("/" if trailing and segs else "")
    url = f"{scheme}://{host}{path}"
    if not _CANONICAL_RE.fullmatch(url):
        return  # e.g. host ending in '-' rejected by the regex — slow path
    for cfg in (NormalizationConfig(), STRICT_NORMALIZATION):
        assert normalize_url(url, cfg) == url


def test_scope_filter_full_match_semantics():
    cfg = CrawlConfig(must_match=(r"https://ok\.example/.*",), must_not_match=(r".*/private/.*",))
    stage = make_scope_filter_stage(cfg)
    t = pa.table(
        {
            "url": pa.array(
                [
                    "https://ok.example/a",
                    "https://ok.example/private/x",
                    "https://other.example/a",
                    "prefix https://ok.example/a",  # fullmatch, not search
                ]
            ),
            "depth": pa.array([0] * 4, pa.int32()),
        }
    )
    assert stage(t).column("url").to_pylist() == ["https://ok.example/a"]


def test_priority_functions_deterministic():
    t = pa.table(
        {
            "url": pa.array(["https://a/1", "https://a/2"]),
            "depth": pa.array([0, 3], pa.int32()),
        }
    )
    bf = make_prioritize_stage(CrawlConfig(priority_fn="breadth_first"))(t)
    assert bf.column("priority").to_pylist() == [0, -3]
    df_ = make_prioritize_stage(CrawlConfig(priority_fn="depth_first"))(t)
    assert df_.column("priority").to_pylist() == [0, 3]
    h1 = make_prioritize_stage(CrawlConfig(priority_fn="breadth_first_hash"))(t)
    h2 = make_prioritize_stage(CrawlConfig(priority_fn="breadth_first_hash"))(t)
    assert h1.column("priority").to_pylist() == h2.column("priority").to_pylist()
    # depth dominates the hash tiebreak
    p = h1.column("priority").to_pylist()
    assert p[0] > p[1]
    with pytest.raises(ValueError):
        make_prioritize_stage(CrawlConfig(priority_fn="nope"))(t)


def test_strict_filter_defers_unknown_hosts(ray_session):
    """Fail-close on an unknown host is TEMPORARY (StrictRobotsFilter
    fail-close-duration): the row is excluded from the wave but NOT sent to
    the reject accumulator, so it stays Discovered and retries."""
    import numpy as np
    import pyarrow as pa
    import ray

    from abwcf_ray.functions.robots import parse_robots_txt
    from abwcf_ray.state.seen import RejectSink
    from abwcf_ray.stages.transform import make_strict_robots_filter
    from abwcf_ray.functions.hashing import hash64

    rules = parse_robots_txt(b"User-agent: *\nDisallow: /private/\n")
    known = "https://known.example"
    from abwcf_ray.state.hosts import rules_payload_from_dict

    payload = rules_payload_from_dict(
        {known: (rules.mode, rules.serialize_rules(), rules.crawl_delay_ms)}
    )
    accum = RejectSink(2)
    stage = make_strict_robots_filter(ray.put(payload), accum)
    batch = pa.table(
        {
            "url": pa.array(
                [
                    "https://known.example/ok",
                    "https://known.example/private/x",
                    "https://unknown.example/page",
                ]
            ),
            "host": pa.array([known, known, "https://unknown.example"]),
        }
    )
    out = stage(batch)
    assert out.column("url").to_pylist() == ["https://known.example/ok"]
    rejected, rej_counts = accum.drain()
    # only the known-rules reject is in the accumulator; the unknown host
    # is deferred, not Disallowed
    assert set(rejected.tolist()) == {int(hash64(["https://known.example/private/x"])[0])}
    assert rej_counts == {known: 1}


def test_bucketed_robots_filter_matches_broadcast(ray_session):
    """The 10^8-host bucketed join path (hash(host)-range buckets +
    per-partition rules) must pass/reject EXACTLY the rows the broadcast
    filters do, for both lenient (C1) and strict (C2) semantics."""
    import numpy as np
    import ray
    import ray.data as rd

    from abwcf_ray.functions.hashing import hash64
    from abwcf_ray.functions.robots import parse_robots_txt
    from abwcf_ray.state.hosts import HostsState, RobotsFetchSim  # noqa: F401
    from abwcf_ray.state.seen import RejectSink
    from abwcf_ray.stages.transform import (
        apply_robots_filter_bucketed,
        make_lenient_robots_filter,
        make_strict_robots_filter,
    )

    rng = np.random.default_rng(11)
    n_hosts = 60
    hosts = [f"https://h{i}.example" for i in range(n_hosts)]
    state = HostsState(CrawlConfig())
    bodies = {
        0: b"User-agent: *\nDisallow: /private/\nAllow: /private/ok\n",
        1: b"User-agent: *\nDisallow: /\n",
        2: b"User-agent: *\nDisallow:\n",
    }
    rows = {"host": [], "rule_mode": [], "robot_rules": [], "crawl_delay_ms": [], "valid_until_s": []}
    for i, h in enumerate(hosts[: n_hosts - 10]):  # last 10 hosts stay UNKNOWN
        r = parse_robots_txt(bodies[i % 3])
        if i % 7 == 0:
            mode, rstr, delay = "ALLOW_NONE", "", 1000
        else:
            mode, rstr, delay = r.mode, r.serialize_rules(), r.crawl_delay_ms
        rows["host"].append(h)
        rows["rule_mode"].append(mode)
        rows["robot_rules"].append(rstr)
        rows["crawl_delay_ms"].append(delay)
        rows["valid_until_s"].append(1e9)
    state.merge_fetched(pa.table(rows))

    host_ix = rng.integers(0, n_hosts, 600)
    paths = rng.choice(["/private/x", "/private/ok", "/ok", "/a?q=1", "/robots.txt"], 600)
    cand = pa.table(
        {
            "url": pa.array([hosts[i] + p for i, p in zip(host_ix, paths)]),
            "host": pa.array([hosts[i] for i in host_ix]),
        }
    )
    payload_ref = ray.put(state.rules_payload(0.0))
    bits = 3
    bucket_refs = [ray.put(p) for p in state.bucketed_rules_payload(0.0, bits)]

    ds = rd.from_arrow(cand).repartition(5)

    # lenient (fail-open)
    want = sorted(
        make_lenient_robots_filter(payload_ref)(cand).column("url").to_pylist()
    )
    got = sorted(
        apply_robots_filter_bucketed(ds, bucket_refs, bits, strict=False)
        .to_pandas()["url"]
        .tolist()
    )
    assert got == want and len(want) < cand.num_rows

    # strict (fail-close + reject side-channel)
    acc_a = RejectSink(2)
    want_s = sorted(
        make_strict_robots_filter(payload_ref, acc_a)(cand).column("url").to_pylist()
    )
    rej_a, _ = acc_a.drain()
    acc_b = RejectSink(2)
    got_s = sorted(
        apply_robots_filter_bucketed(ds, bucket_refs, bits, strict=True, reject_accum=acc_b)
        .to_pandas()["url"]
        .tolist()
    )
    rej_b, _ = acc_b.drain()
    assert got_s == want_s and len(want_s) < len(want)
    assert sorted(rej_a.tolist()) == sorted(rej_b.tolist()) and len(rej_a)


@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp"]),
    host=st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.\-]{0,15}", fullmatch=True),
    port=st.sampled_from(["", ":443", ":80", ":0443", ":8080", ":080", ":0"]),
    segs=st.lists(
        st.text(alphabet=string.ascii_letters + string.digits + "_-", min_size=1, max_size=6),
        min_size=0,
        max_size=4,
    ),
    trailing=st.booleans(),
)
@settings(max_examples=400, deadline=None)
def test_normalize_rescue_pass_matches_scalar(scheme, host, port, segs, trailing):
    """The vectorized rescue pass (lowercase scheme/host, default-port
    strip, ''->'/' path) must agree with normalize_url for every config —
    it fires on exactly the scheme://host[:port]<canonical-path> grammar."""
    path = "".join("/" + s for s in segs) + ("/" if trailing and segs else "")
    url = f"{scheme}://{host}{port}{path}"
    for cfg in (NormalizationConfig(), STRICT_NORMALIZATION, NormalizationConfig(False, False, False)):
        want = normalize_url(url, cfg)
        out = _norm_batch([url], CrawlConfig(normalization=cfg))
        got = out.column("url").to_pylist()
        if want is None:
            assert got == []
        else:
            # the stage additionally requires a host-extract hit; every
            # normalized url carries scheme://authority so it must survive
            assert got == [want], (url, want, got)
