"""HTML link/text extraction tests (HtmlParser.scala:29-72,
RobotsHeaderFilter.scala:26-37)."""

from __future__ import annotations

from abwcf_ray.functions.htmlx import header_nofollow, parse_document

BASE = "https://h.example/dir/page"


def test_link_extraction_absolutize_distinct_http_only():
    html = b"""<html><body>
    <a href="/abs">a</a>
    <a href="rel">b</a>
    <a href="https://other.example/x">c</a>
    <a href="/abs">dup</a>
    <a href="mailto:x@example.com">m</a>
    <a href="ftp://f.example/x">f</a>
    <a name="no-href">n</a>
    <a href="HTTP://UPPER.example/">u</a>
    </body></html>"""
    links, text, nofollow = parse_document(html, BASE)
    assert links == [
        "https://h.example/abs",
        "https://h.example/dir/rel",
        "https://other.example/x",
        "HTTP://UPPER.example/",  # first-4-chars http check is case-insensitive
    ]
    assert not nofollow


def test_meta_robots_nofollow_skips_document():
    html = b'<html><head><meta name="robots" content="noindex, NOFOLLOW"></head>' \
           b'<body><h1>T</h1><a href="/x">x</a></body></html>'
    links, text, nofollow = parse_document(html, BASE)
    assert nofollow and links == []
    assert text == "T"  # text still extracted (consumer runs regardless)


def test_meta_robots_other_tokens_ok():
    html = b'<html><head><meta name="robots" content="noindex"></head>' \
           b'<body><a href="/x">x</a></body></html>'
    links, _, nofollow = parse_document(html, BASE)
    assert not nofollow and links == ["https://h.example/x"]


def test_text_extraction_h1_p_joined():
    html = b"<html><body><h1>Title &amp; more</h1><p>one</p><p>two &lt;3</p>" \
           b'<a href="/x">link</a></body></html>'
    _, text, _ = parse_document(html, BASE)
    assert text == "Title & more\n\none\n\ntwo <3"


def test_header_nofollow():
    assert header_nofollow("noindex, NoFollow")
    assert header_nofollow(" nofollow ")
    assert not header_nofollow("noindex")
    assert not header_nofollow(None)
    assert not header_nofollow("nofollowish")
