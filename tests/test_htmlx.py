"""HTML link/text extraction tests (HtmlParser.scala:29-72,
RobotsHeaderFilter.scala:26-37)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

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


# --------------------------------------------------------------------------
# fast-lexer differential coverage: _fast_parse must equal the html.parser
# state machine byte-for-byte wherever it claims applicability
# --------------------------------------------------------------------------
def _slow(html):
    from abwcf_ray.functions.htmlx import _DocParser

    p = _DocParser()
    p.feed(html)
    p.close()
    return p.hrefs, p.meta_nofollow, p._text_parts


_ADVERSARIAL = [
    '<html><head><title>T</title></head><body><h1>A&amp;B</h1><p>x<a href="http://x/1">l</a>y</p></body></html>',
    '<!DOCTYPE html><html><body><h1>Doc</h1><!-- comment <p>no</p> --><p>real</p></body></html>',
    '<html><body><script>var a = "<p>not text</p>";</script><h1>H</h1></body></html>',
    '<html><body><h1>a<script>if(x<y){}</script>b</h1></body></html>',
    '<html><body><style>.c{color:red}</style><p>p1</p><p>p2</p></body></html>',
    '<html><body><h1>unclosed',
    '<html><body><p>before<h1>nested?</h1>after</p></body></html>',
    '<html><body><p>a &lt; b &gt; c &#65; &quot;</p></body></html>',
    '<meta name="ROBOTS" content="NOINDEX, NOFOLLOW"><a href="http://x">y</a>',
    "<meta name='robots' content='nofollow'>",
    '<a href=http://bare.example/x>bare</a>',
    '<a href="http://x/?a=1&amp;b=2">amp</a>',
    '<p>text with < stray bracket</p>',
    '<p>5 < 6 and 7 > 3</p>',
    '<h1/><p>selfclose</p>',
    '<p >spaced</p ><a  href="http://s/">s</a>',
    '<script>unterminated...',
    '<h1>text<style>x</style>more</h1>',
    '<P>UPPER</P><H1>CAPS</H1>',
    '<p title="a>b">attr-gt</p>',
    '<a href="">empty</a><a>nohref</a>',
    '<p>a<br/>b</p>',
    '<p>&notarealentity; &amp</p>',
    '<a title="href=http://trap/" href="http://real/">x</a>',
    '<a href="http://1" href="http://2">dup</a>',
    '<meta content="nofollow" name="robots">reversed attrs',
    '<meta name="robots" content="noindex , NOFOLLOW ">ws',
    '<a href>barenoval</a>',
    '<a data-href="http://no/" href="http://yes/">d</a>',
    '<p disabled>flag</p>',
]


def test_fast_lexer_matches_html_parser_adversarial():
    from abwcf_ray.functions.htmlx import _fast_parse

    for doc in _ADVERSARIAL:
        fast = _fast_parse(doc)
        assert fast is not None, f"unexpected fallback for {doc[:60]!r}"
        assert fast == _slow(doc), doc


def test_fast_lexer_falls_back_on_unsupported_constructs():
    from abwcf_ray.functions.htmlx import _fast_parse

    for doc in [
        "<![CDATA[raw]]><p>x</p>",
        "<?php echo 1; ?><p>x</p>",
        "<!DOCTYPE html [ <!ENTITY x 'y'> ]><p>x</p>",
    ]:
        assert _fast_parse(doc) is None  # parse_document still works
        from abwcf_ray.functions.htmlx import parse_document

        links, text, nf = parse_document(doc, "https://b/")
        assert text == "x"


def test_fast_lexer_matches_on_corpus_pages(tmp_path):
    """Every generated corpus page takes the fast path and matches the
    state machine exactly."""
    import pyarrow.dataset as pads

    from abwcf_ray.functions.htmlx import _fast_parse
    from abwcf_ray.sources.corpus import generate_corpus

    meta = generate_corpus(tmp_path / "c", n_pages=500, seed=3, num_buckets=4)
    pages = pads.dataset(meta.pages_dir).to_table(columns=["html"])
    checked = 0
    for h in pages.column("html").to_pylist():
        if not h:
            continue
        doc = h.decode("utf-8", errors="replace")
        fast = _fast_parse(doc)
        assert fast is not None
        assert fast == _slow(doc)
        checked += 1
    assert checked > 400


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "<p>", "</p>", "<h1>", "</h1>", "<a href=\"http://x/1\">",
                "<a href='http://y/2?a=1&amp;b=2'>", "</a>", "text ", "5 < 6 ",
                "&amp; ", "&#65;", "<br/>", "<div>", "</div>", "<!-- c -->",
                "<script>v<1</script>", "<style>.x{}</style>",
                "<meta name=\"robots\" content=\"nofollow\">", "<h1/>",
                "<P >", "</P >", "tail<", ">lead", "&bogus;",
            ]
        ),
        min_size=0,
        max_size=30,
    )
)
def test_fast_lexer_matches_on_html_soup(pieces):
    from abwcf_ray.functions.htmlx import _fast_parse

    doc = "".join(pieces)
    fast = _fast_parse(doc)
    if fast is None:
        return  # legitimate fallback
    assert fast == _slow(doc), doc


def test_hyphenated_tag_names_fall_back_and_match():
    """Custom elements / malformed tag names ('<p-card>', '<h1-x>',
    '<a-b href>') lex differently than html.parser's tag-name charset, so
    the guard must route them to the exact fallback (round-2 ADVICE)."""
    from abwcf_ray.functions.htmlx import _fast_parse, parse_document

    docs = [
        "<p-card>x</p-card><p>real</p>",
        "<h1-x>B</h1-x><h1>H</h1>",
        '<a-b href="http://no/">n</a-b><a href="http://yes/">y</a>',
        '<p=weird>q</p=weird><p>ok</p>',
        "<P-CARD>upper</P-CARD>",
    ]
    for doc in docs:
        assert _fast_parse(doc) is None, doc  # guard forces fallback
        links, text, nf = parse_document(doc, "https://b/")
        hrefs, meta_nf, parts = _slow(doc)
        assert text == "\n\n".join(parts), doc
        assert nf == meta_nf
        # links equal the slow path's hrefs after the same absolutize rule
        from urllib.parse import urljoin

        exp = []
        seen = set()
        for h in hrefs:
            a = urljoin("https://b/", h.strip())
            if len(a) >= 4 and a[:4].lower() == "http" and a not in seen:
                seen.add(a)
                exp.append(a)
        assert links == exp, doc


def test_abs_href_fast_agrees_with_urljoin():
    """The absolute-href fast path must return a string ONLY when urljoin
    would return the identical string for any http(s) base."""
    from urllib.parse import urljoin

    from abwcf_ray.functions.htmlx import _abs_href_fast

    bases = [
        "https://h0.example/p0",
        "http://h0.example/a/b/p26",
        "https://h1.example/",
        "http://h1.example/x;p?q=1",
    ]
    cases = [
        "https://h0.example/p1",
        "http://h0.example/a/b/p26",
        "https://h2.example/a/p31?x=1&y=2",
        "https://h2.example/p;params",
        "https://h2.example/p?a?b",
        "https://h2.example/a%2Fb",
        "https://h2.example",
        "https://x/鉄",
        "https://x/a b",   # space preserved by urljoin roundtrip
        # must be rejected by the fast path (urljoin changes them):
        "https://h2.example/p?",
        "https://h2.example/p#frag",
        "https://h2.example/p#",
        "https:///nopath-authority",
        "https://",
        "HTTPS://h2.example/p",
        "https://h2.example/a\tb",
        "https://h2.example/a\nb",
        "//h2.example/p",
        "/rooted",
        "rel/ative",
        "ftp://h2.example/p",
        "",
    ]
    for base in bases:
        for href in cases:
            got = _abs_href_fast(href)
            if got is not None:
                assert got == urljoin(base, href), (base, href)


def test_abs_href_fast_agrees_on_random_hrefs():
    from urllib.parse import urljoin

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from abwcf_ray.functions.htmlx import _abs_href_fast

    @settings(max_examples=500, deadline=None)
    @given(
        st.sampled_from(["https://", "http://", "HTTP://", "https:/", "//", ""]),
        st.text(
            alphabet="ab/?#;=&%.:\t\n []@!$'()*+,~-_0防",
            min_size=0,
            max_size=25,
        ),
    )
    def run(prefix, rest):
        href = prefix + rest
        got = _abs_href_fast(href)
        if got is not None:
            try:
                expected = urljoin("https://h0.example/p0", href)
            except ValueError:
                raise AssertionError(f"fast path accepted raising href {href!r}")
            assert got == expected, href

    run()


def test_malformed_href_does_not_crash_parse():
    """urljoin raises ValueError on unbalanced IPv6 brackets; the parser
    must drop the link (Jsoup absUrl -> ''), not crash the task."""
    from abwcf_ray.functions.htmlx import parse_document

    doc = '<a href="http://[bad">x</a><a href="https://ok.example/p">y</a><p>t</p>'
    links, text, nf = parse_document(doc, "https://h0.example/p0")
    assert links == ["https://ok.example/p"]
    assert text == "t"


# ------------------------------------------------------------- anchor text


def _anchors_reference(html, base):
    """html.parser-based reference: (absolute href, tag-stripped collapsed
    inner text) per <a href="...">, empty-text anchors dropped."""
    import re
    from html.parser import HTMLParser
    from urllib.parse import urljoin

    out = []

    class P(HTMLParser):
        def __init__(self):
            super().__init__()
            self.stack = []

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                href = dict(attrs).get("href")
                self.stack.append([href, []])

        def handle_data(self, data):
            for fr in self.stack:
                fr[1].append(data)

        def handle_endtag(self, tag):
            if tag == "a" and self.stack:
                href, parts = self.stack.pop()
                text = re.sub(r"\s+", " ", " ".join(parts)).strip()
                if href is None or not text:
                    return
                try:
                    absu = urljoin(base, href)
                except ValueError:
                    return
                if absu.startswith(("http://", "https://")):
                    out.append((absu, text))

    p = P()
    p.feed(html)
    return out


def test_anchor_texts_differential():
    from abwcf_ray.functions.htmlx import anchor_texts

    base = "https://h7.example/dir/page"
    html = (
        '<html><body><a href="https://x.example/p1">first link</a> '
        '<a href="/rooted">go <b>up</b>\n  now</a>'
        '<a href="rel/p2">  spaced   words </a>'
        '<a href="https://y.example/e"><img src="i.png"></a>'  # empty text
        '<p>no anchor</p><a href="https://z.example/q">last</a></body></html>'
    )
    got = anchor_texts(html, base)
    assert got == _anchors_reference(html, base)
    assert ("https://h7.example/rooted", "go up now") in got
    assert all(t for _, t in got)


def test_anchor_texts_corpus_differential(ray_session):
    """Every corpus page's anchors match the html.parser reference."""
    from abwcf_ray.functions.htmlx import anchor_texts
    from abwcf_ray.sources.corpus import generate_corpus

    import pyarrow.dataset as pads

    corpus = generate_corpus("/tmp/abwcf_anchor_test_300", n_pages=300, seed=42)
    t = pads.dataset(corpus.pages_dir).to_table(columns=["url", "html"])
    n_pairs = 0
    for u, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        html = h.decode()
        got = anchor_texts(html, u)
        assert got == _anchors_reference(html, u), u
        n_pairs += len(got)
    assert n_pairs > 100  # non-degenerate


def test_anchor_texts_bytes_and_garbage():
    from abwcf_ray.functions.htmlx import anchor_texts

    assert anchor_texts(b"\xff\xfe<a href=\"https://a.example/x\">t</a>", "https://b.example/") == [
        ("https://a.example/x", "t")
    ]
    assert anchor_texts("<a href='unquoted-not-supported'>t</a>", "https://b.example/") == []
    assert anchor_texts("", "https://b.example/") == []
