"""robots.txt parser/matcher tests (RFC 9309 / crawler-commons semantics,
HostManager.scala:112-136)."""

from __future__ import annotations

import pandas as pd

from abwcf_ray.functions.robots import (
    ALLOW_ALL,
    ALLOW_NONE,
    ALLOW_SOME,
    RobotRules,
    clamp_delay_ms,
    parse_robots_txt,
)

BODY = b"""
# comment
User-agent: *
Disallow: /private/
Allow: /private/public/
Disallow: /tmp
Crawl-delay: 2
"""


def test_parse_and_match_prefixes():
    r = parse_robots_txt(BODY)
    assert r.mode == ALLOW_SOME
    assert r.crawl_delay_ms == 2000
    assert r.is_allowed("https://x.example/ok")
    assert not r.is_allowed("https://x.example/private/a")
    # longest match wins: Allow /private/public/ beats Disallow /private/
    assert r.is_allowed("https://x.example/private/public/a")
    assert not r.is_allowed("https://x.example/tmpfile")  # prefix semantics
    assert r.is_allowed("https://x.example/robots.txt")


def test_batch_matches_scalar():
    r = parse_robots_txt(BODY)
    urls = pd.Series(
        [
            "https://x.example/ok",
            "https://x.example/private/a",
            "https://x.example/private/public/a",
            "https://x.example/tmp",
            "https://x.example/robots.txt",
        ]
    )
    assert list(r.is_allowed_batch(urls)) == [r.is_allowed(u) for u in urls]


def test_wildcard_and_anchor():
    r = parse_robots_txt(b"User-agent: *\nDisallow: /*.pdf$\nDisallow: /x*y\n")
    assert not r.is_allowed("https://h/doc.pdf")
    assert r.is_allowed("https://h/doc.pdf?x")  # $ anchors end incl. query
    assert not r.is_allowed("https://h/x123y")
    assert r.is_allowed("https://h/x123z")


def test_allow_beats_disallow_on_tie():
    r = parse_robots_txt(b"User-agent: *\nDisallow: /dir/\nAllow: /dir2/\n")
    assert r.is_allowed("https://h/dir2/a")
    r2 = parse_robots_txt(b"User-agent: *\nDisallow: /a/\nAllow: /a/\n")
    assert r2.is_allowed("https://h/a/x")  # equal length -> allow wins


def test_specific_agent_group():
    body = b"User-agent: mybot\nDisallow: /only-mybot/\n\nUser-agent: *\nDisallow: /all/\n"
    r_star = parse_robots_txt(body, user_agents=())
    assert not r_star.is_allowed("https://h/all/x")
    assert r_star.is_allowed("https://h/only-mybot/x")
    r_my = parse_robots_txt(body, user_agents=("MyBot",))
    assert not r_my.is_allowed("https://h/only-mybot/x")
    assert r_my.is_allowed("https://h/all/x")  # specific group overrides *


def test_empty_disallow_allows_everything():
    r = parse_robots_txt(b"User-agent: *\nDisallow:\n")
    assert r.mode == ALLOW_ALL
    assert r.is_allowed("https://h/anything")


def test_delay_clamping():
    # HostManager.scala:126-136 + reference.conf:211-219 defaults
    assert clamp_delay_ms(None, 1000, 0, 20000) == 1000
    assert clamp_delay_ms(-5, 1000, 0, 20000) == 1000
    assert clamp_delay_ms(30000, 1000, 0, 20000) == 20000
    assert clamp_delay_ms(0, 1000, 0, 20000) == 0
    r = parse_robots_txt(b"User-agent: *\nDisallow: /x\nCrawl-delay: 30\n")
    assert r.crawl_delay_ms == 20000


def test_modes_and_serialization_roundtrip():
    r = parse_robots_txt(BODY)
    s = r.serialize_rules()
    r2 = RobotRules.deserialize(r.mode, s, r.crawl_delay_ms)
    assert r2 == RobotRules(mode=r.mode, rules=r.rules, crawl_delay_ms=r.crawl_delay_ms)
    assert not RobotRules(mode=ALLOW_NONE).is_allowed("https://h/x")
    assert RobotRules(mode=ALLOW_ALL).is_allowed("https://h/x")


def test_vectorized_target_parity_query_only_urls(ray_session):
    """The vectorized filter stage's matcher target must equal the scalar
    RobotRules path for query-carrying URLs, including an empty path plus
    query ('https://x?q=1' -> '/?q=1') — round-2 ADVICE parity fix."""
    import numpy as np
    import pyarrow as pa
    import ray

    from abwcf_ray.stages.transform import _allowed_mask

    body = b"User-agent: *\nDisallow: /?q=\nDisallow: /p1\n"
    rules = parse_robots_txt(body)
    host = "https://x.example"
    urls = [
        "https://x.example?q=1",          # empty path + query -> '/?q=1'
        "https://x.example/?q=1",
        "https://x.example/?other=1",
        "https://x.example/p1?q=1",
        "https://x.example/p2?",          # trailing '?' with empty query
        "https://x.example/p2#frag",
        "https://x.example",
    ]
    from abwcf_ray.state.hosts import rules_payload_from_dict

    payload = rules_payload_from_dict(
        {host: (rules.mode, rules.serialize_rules(), rules.crawl_delay_ms)}
    )
    batch = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array([host] * len(urls), pa.string()),
        }
    )
    got = _allowed_mask(ray.put(payload), batch, True)
    want = np.array([rules.is_allowed(u) for u in urls])
    assert (got == want).all(), list(zip(urls, got, want))
    # the disallow actually bites somewhere (guard against vacuous parity)
    assert not want.all()


import string as _string

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    pats=st.lists(
        st.text(alphabet=_string.ascii_lowercase + "/*$._-%~", min_size=1, max_size=10),
        min_size=1,
        max_size=4,
    ),
    allows=st.lists(st.booleans(), min_size=4, max_size=4),
    urls_suffix=st.lists(
        st.text(alphabet=_string.ascii_lowercase + "/?=&._-%~", min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    ),
)
@settings(max_examples=200, deadline=None)
def test_vectorized_rules_match_scalar_hypothesis(ray_session, pats, allows, urls_suffix):
    """Random rule patterns (incl. '*' wildcards and '$' anchors) x random
    urls: the vectorized filter (Rust-regex match pass) must agree with the
    scalar RobotRules.is_allowed for every row."""
    import numpy as np
    import pyarrow as pa
    import ray

    from abwcf_ray.functions.robots import ALLOW_SOME, RobotRules
    from abwcf_ray.state.hosts import rules_payload_from_dict
    from abwcf_ray.stages.transform import _RULES_STATE, _allowed_mask

    host = "https://hyp.example"
    rules = RobotRules(
        mode=ALLOW_SOME,
        rules=tuple(
            (p, a)
            for p, a in zip(
                sorted(set(pats), key=lambda p: (-len(p), p)), allows
            )
        ),
        crawl_delay_ms=0,
    )
    urls = [host + ("/" + s if not s.startswith("/") else s) for s in urls_suffix]
    payload = rules_payload_from_dict(
        {host: (rules.mode, rules.serialize_rules(), rules.crawl_delay_ms)}
    )
    _RULES_STATE.clear()
    batch = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array([host] * len(urls), pa.string()),
        }
    )
    got = _allowed_mask(ray.put(payload), batch, True)
    want = np.array([rules.is_allowed(u) for u in urls])
    assert (got == want).all(), list(zip(urls, got, want))


def test_rust_pattern_literal_backslash_z():
    """A rule whose path literally contains backslash-Z must match the same
    URLs on the Rust (polars) fast path as on the Python re fallback: the
    old blanket ``pattern.replace('\\Z', '\\z')`` rewrote the tail of the
    ESCAPED literal, silently changing the matched byte."""
    import polars as pl

    from abwcf_ray.functions.robots import _pattern_to_regex, _pattern_to_rust

    targets = ["/a\\Zb", "/a\\zb", "/aZb", "/x", "/a\\Z", "/a\\z"]
    s = pl.Series(targets)
    for rule in ["/a\\Z", "/a\\Zb$", "/a*\\Z", "/a\\Z$"]:
        py = _pattern_to_regex(rule)
        rust = _pattern_to_rust(rule)
        want = [bool(py.match(t)) for t in targets]
        got = s.str.contains(rust).fill_null(False).to_list()
        assert got == want, (rule, rust, py.pattern, want, got)
    # and the anchor itself still translates: '$'-anchored rules match
    # end-of-string on both engines
    py = _pattern_to_regex("/exact$")
    rust = _pattern_to_rust("/exact$")
    s2 = pl.Series(["/exact", "/exactly", "/exact/"])
    assert s2.str.contains(rust).to_list() == [True, False, False]
    assert [bool(py.match(t)) for t in s2.to_list()] == [True, False, False]
