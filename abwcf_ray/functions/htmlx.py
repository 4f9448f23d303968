"""HTML link extraction and text extraction.

Link extraction reimplements the reference's Jsoup-based ``HtmlParser``
(src/main/scala/abwcf/actors/HtmlParser.scala:29-72) on the stdlib
``html.parser``:

- the whole document is skipped when any ``<meta name="robots" content>``
  contains the token ``nofollow`` (case-insensitive, comma-split, trimmed)
  (HtmlParser.scala:65-72);
- ``a[href]`` values are absolutized against the page URL, deduplicated
  per document preserving first occurrence (HtmlParser.scala:40), and only
  URLs whose first four characters are ``http`` case-insensitively survive
  (HtmlParser.scala:41);
- the ``X-Robots-Tag`` response-header gate (RobotsHeaderFilter.scala:26-37)
  is exposed as :func:`header_nofollow` and applied by the caller before
  parsing.

Text extraction implements the rebuild's default FetchResultConsumer
(A7, SURVEY.md §2): the text content of ``<h1>`` and ``<p>`` elements in
document order, joined with blank lines. The fixture generator writes HTML
by inverse of this rule, so extraction is byte-identical to the corpus
ground-truth ``text`` column.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from urllib.parse import urljoin

_TEXT_TAGS = {"h1", "p"}


class _DocParser(HTMLParser):
    """One-pass extraction of links, meta-robots flags, and text."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []
        self.meta_nofollow = False
        self._text_parts: list[str] = []
        self._cur: list[str] | None = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)
                    break
        elif tag == "meta":
            d = dict(attrs)
            if (d.get("name") or "").lower() == "robots" and "content" in d:
                tokens = (t.strip().lower() for t in (d.get("content") or "").split(","))
                if "nofollow" in tokens:
                    self.meta_nofollow = True
        elif tag in _TEXT_TAGS:
            self._cur = []

    def handle_endtag(self, tag: str) -> None:
        if tag in _TEXT_TAGS and self._cur is not None:
            self._text_parts.append("".join(self._cur))
            self._cur = None

    def handle_data(self, data: str) -> None:
        if self._cur is not None:
            self._cur.append(data)

    def text(self) -> str:
        return "\n\n".join(self._text_parts)


# --------------------------------------------------------------------------
# Fast path: a regex lexer replicating _DocParser's observable output
# (hrefs, meta-robots flag, h1/p text parts) at ~2.5-3x the speed of
# html.parser's per-character state machine. Conservative by construction:
# any document containing a construct the lexer cannot replicate
# byte-identically (CDATA sections, processing instructions, declarations
# with an internal subset) falls back to html.parser — and so does any
# lexer exception. Differential tests (tests/test_htmlx.py) assert
# byte-identical results on corpus pages, adversarial fixtures and
# generated html soup.
# --------------------------------------------------------------------------
_GUARD_RE = re.compile(r"<!\[|<\?|<![^>]*\[")
_LEX_RE = re.compile(
    r"<!--.*?-->"  # comment: skipped, emits no data (like handle_comment)
    r"|<![^>]*>"  # doctype/declaration: skipped
    r"|<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>",
    re.S,
)
# ordered attribute tokenizer: quoted values are consumed as units, so an
# attribute-shaped string INSIDE a value can never parse as an attribute.
# Unquoted values include "/" (html.parser: <a href=http://x/> has value
# "http://x/" and is NOT self-closing).
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)
# CDATA content elements (html.parser's CDATA_CONTENT_ELEMENTS): body up to
# the matching close tag is raw character data, never unescaped
_RAW_TAGS = ("script", "style")

# the overwhelmingly common <a> attribute string: exactly one double-quoted
# href. Anchored match over the WHOLE attrs string, so an attribute-shaped
# 'href=' inside some other attribute's quoted value can never hit this
# path — anything else falls back to the ordered tokenizer.
_HREF_ONLY_RE = re.compile(r'\s+href\s*=\s*"([^"]*)"\s*$')

# see _abs_href_fast: hrefs for which urljoin provably returns the input
_ABS_FAST_RE = re.compile(
    r"https?://[^/?#;\[\]\t\r\n]+(?:[/?][^#;\[\]\t\r\n]*)?(?<!\?)\Z"
)


def _attrs_of(attrs_str: str) -> tuple[list[tuple[str, str | None]], int]:
    """-> (ordered (name, value) pairs, end offset of the last token).
    The end offset distinguishes a self-closing slash (left unconsumed,
    ``<p class/>``) from a slash inside an unquoted value (``href=http://x/``)."""
    out = []
    consumed = 0
    for m in _ATTR_RE.finditer(attrs_str):
        name = m.group(1).lower()
        v = m.group(2)
        if v is not None:
            if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
                v = v[1:-1]
            v = unescape(v)
        out.append((name, v))
        consumed = m.end()
    return out, consumed


# case-insensitive raw-tag presence check: pages without script/style (the
# overwhelming majority of extraction-worthy documents) take a finditer
# loop with no position juggling — one C-level scan decides
_HAS_RAW_RE = re.compile(r"(?i)<(?:script|style)")


def _fast_parse_noraw(html_text: str):
    """The `_fast_parse` loop specialized for documents with NO script/style
    elements: a single ``finditer`` pass (no per-tag ``search`` re-entry, no
    raw-text position jumps). Behavior is byte-identical to `_fast_parse`
    for such documents — the differential tests exercise both paths."""
    hrefs: list[str] = []
    meta_nofollow = False
    parts: list[str] = []
    cur: list[str] | None = None
    prev = 0
    for m in _LEX_RE.finditer(html_text):
        if cur is not None and m.start() > prev:
            cur.append(unescape(html_text[prev : m.start()]))
        prev = m.end()
        closing, tag, attrs = m.group(1, 2, 3)
        if tag is None:
            continue  # comment / declaration
        tag = tag.lower()
        if attrs and attrs[0] not in " \t\n\r\f/":
            return None  # tag name continues past the lexer charset
        if closing:
            if tag in _TEXT_TAGS and cur is not None:
                parts.append("".join(cur))
                cur = None
            continue
        if tag == "a":
            hm = _HREF_ONLY_RE.match(attrs) if attrs else None
            if hm is not None:
                v = hm.group(1)
                hrefs.append(unescape(v) if "&" in v else v)
            else:
                for name, value in _attrs_of(attrs)[0]:
                    if name == "href" and value is not None:
                        hrefs.append(value)
                        break
        elif tag == "meta":
            d = dict(_attrs_of(attrs)[0])
            if (d.get("name") or "").lower() == "robots" and "content" in d:
                tokens = (t.strip().lower() for t in (d.get("content") or "").split(","))
                if "nofollow" in tokens:
                    meta_nofollow = True
        elif tag in _TEXT_TAGS:
            if not attrs or attrs.isspace():
                cur = []
                continue
            pairs, consumed = _attrs_of(attrs)
            if attrs[consumed:].strip() == "/":
                parts.append("")
                cur = None
            else:
                cur = []
    if cur is not None and prev < len(html_text):
        cur.append(unescape(html_text[prev:]))
    return hrefs, meta_nofollow, parts


def _fast_parse(html_text: str):
    """-> (hrefs, meta_nofollow, text_parts) or None when inapplicable."""
    if _GUARD_RE.search(html_text):
        return None
    if _HAS_RAW_RE.search(html_text) is None:
        return _fast_parse_noraw(html_text)
    lower = None
    hrefs: list[str] = []
    meta_nofollow = False
    parts: list[str] = []
    cur: list[str] | None = None
    pos = 0
    n = len(html_text)
    while pos < n:
        m = _LEX_RE.search(html_text, pos)
        if m is None:
            if cur is not None and pos < n:
                cur.append(unescape(html_text[pos:]))
            break
        if cur is not None and m.start() > pos:
            cur.append(unescape(html_text[pos : m.start()]))
        pos = m.end()
        closing, tag, attrs = m.group(1, 2, 3)
        if tag is None:
            continue  # comment / declaration
        tag = tag.lower()
        if attrs and attrs[0] not in " \t\n\r\f/":
            # the tag NAME continues past the lexer's [a-zA-Z0-9] charset —
            # html.parser's names run to whitespace/'/'/'>', so '<p-card>'
            # is tag 'p-card' there but would lex as 'p' with attrs '-card'
            # here (custom elements, '<a=b>', ...): force the exact
            # fallback instead of silently diverging (round-2 ADVICE)
            return None
        if closing:
            if tag in _TEXT_TAGS and cur is not None:
                parts.append("".join(cur))
                cur = None
            continue
        if tag in _RAW_TAGS:
            if lower is None:
                lower = html_text.lower()
            end = lower.find("</" + tag, pos)
            if end < 0:  # unterminated: rest of doc is raw data
                if cur is not None:
                    cur.append(html_text[pos:])
                break
            if cur is not None:
                cur.append(html_text[pos:end])
            close = lower.find(">", end)
            pos = n if close < 0 else close + 1
            continue
        if tag == "a":
            hm = _HREF_ONLY_RE.match(attrs) if attrs else None
            if hm is not None:
                v = hm.group(1)
                hrefs.append(unescape(v) if "&" in v else v)
            else:
                for name, value in _attrs_of(attrs)[0]:
                    if name == "href" and value is not None:
                        hrefs.append(value)
                        break
        elif tag == "meta":
            d = dict(_attrs_of(attrs)[0])
            if (d.get("name") or "").lower() == "robots" and "content" in d:
                tokens = (t.strip().lower() for t in (d.get("content") or "").split(","))
                if "nofollow" in tokens:
                    meta_nofollow = True
        elif tag in _TEXT_TAGS:
            if not attrs or attrs.isspace():  # '<p>', '<h1 >': no attrs,
                cur = []                      # cannot be self-closing
                continue
            pairs, consumed = _attrs_of(attrs)
            if attrs[consumed:].strip() == "/":  # standalone trailing slash
                # html.parser startendtag = starttag (cur reset, discarding
                # any open capture) + endtag (emit empty part)
                parts.append("")
                cur = None
            else:
                cur = []
    return hrefs, meta_nofollow, parts


def _abs_href_fast(href: str) -> str | None:
    """``href`` unchanged IF ``urljoin(any_http_base, href) == href`` is
    guaranteed, else None (caller falls back to ``urljoin``).

    For an absolute lowercase-scheme http(s) href, CPython's urljoin either
    returns the href verbatim (schemes differ) or re-emits
    ``urlunparse(urlparse(href))`` (schemes equal). That roundtrip is the
    identity unless one of the parser's edge rules fires, each excluded
    here: empty authority (``http:///p`` re-merges against the base),
    tab/CR/LF stripping (urlsplit deletes them), an empty trailing query or
    any fragment (``?``/``#`` with nothing behind them are dropped by
    urlunsplit — ``#`` is excluded entirely because ``#`` handling also
    depends on allow_fragments). ~90% of real-corpus hrefs are clean
    absolute links, and urljoin (two urlparses + an unparse per call) was
    ~45% of the whole parse kernel's profile.

    All rules are encoded in ONE anchored regex (six separate substring
    scans profiled at ~11% of the kernel): lowercase http(s) scheme,
    nonempty authority with no ``/?#``, then an optional ``/``- or
    ``?``-led remainder; ``#``, ``[``, ``]``, ``;``, tab/CR/LF excluded
    everywhere (bracket-host validation may raise; trailing empty
    params/query are dropped by unparse; urlsplit strips whitespace
    bytes); a trailing ``?`` rejected by lookbehind."""
    return href if _ABS_FAST_RE.match(href) else None


def parse_document(html: bytes | str, base_url: str) -> tuple[list[str], str, bool]:
    """Parse one document -> (links, text, meta_nofollow).

    ``links`` is empty when meta_nofollow is set (the reference skips link
    extraction for the whole document); ``text`` is always extracted (the
    FetchResultConsumer runs regardless of robots meta, SURVEY.md A7).
    Uses the regex lexer fast path when applicable, the html.parser state
    machine otherwise — identical output either way (differential-tested).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    try:
        fast = _fast_parse(html)
    except Exception:
        fast = None
    if fast is not None:
        hrefs, meta_nofollow, text_parts = fast
        text = "\n\n".join(text_parts)
    else:
        p = _DocParser()
        try:
            p.feed(html)
            p.close()
        except Exception:
            return [], "", False
        hrefs, meta_nofollow, text = p.hrefs, p.meta_nofollow, p.text()
    if meta_nofollow:
        return [], text, True

    links: list[str] = []
    seen: set[str] = set()
    for href in hrefs:
        href = href.strip()
        absolute = _abs_href_fast(href)
        if absolute is None:
            try:
                absolute = urljoin(base_url, href)
            except ValueError:
                # malformed href (e.g. unbalanced IPv6 bracket): Jsoup's
                # absUrl yields "" and the reference drops invalid URLs —
                # skip the link instead of crashing the task
                continue
        if len(absolute) >= 4 and absolute[:4].lower() == "http" and absolute not in seen:
            seen.add(absolute)
            links.append(absolute)
    return links, text, False


def header_nofollow(x_robots_tag: str | None) -> bool:
    """True when an ``X-Robots-Tag`` header value forbids following links
    (RobotsHeaderFilter.scala:26-37: comma-split, trim, case-insensitive)."""
    if not x_robots_tag:
        return False
    return any(t.strip().lower() == "nofollow" for t in x_robots_tag.split(","))


# ------------------------------------------------------------- anchor text

_ANCHOR_RE = re.compile(
    r'<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a\s*>',
    re.IGNORECASE | re.DOTALL,
)
_TAG_STRIP_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def anchor_texts(html: bytes | str, base_url: str) -> list[tuple[str, str]]:
    """Extract (absolute_href, anchor_text) pairs — the labeled link-graph
    edges (anchor text is the classic web-ranking / page-labeling asset
    the plain link extractor drops). Inner markup is stripped, whitespace
    collapsed; anchors with empty text or un-absolutizable hrefs drop.
    Href absolutization shares :func:`_abs_href_fast`'s invariant fast
    path with the link extractor (urljoin fallback, malformed drop).

    Regex-lexer scope (same contract as the fast parse paths): handles
    the double-quoted-href, properly-nested markup the extraction corpus
    carries; exotic markup (unquoted hrefs, anchors inside comments)
    falls outside it — the differential tests pin the supported shapes
    against html.parser.
    """
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    out = []
    for m in _ANCHOR_RE.finditer(html):
        href = m.group(1)
        text = _WS_RE.sub(" ", _TAG_STRIP_RE.sub(" ", m.group(2))).strip()
        if not text:
            continue
        absu = _abs_href_fast(href)
        if absu is None:
            try:
                absu = urljoin(base_url, href)
            except ValueError:
                continue
            if not absu.startswith(("http://", "https://")):
                continue
        out.append((absu, text))
    return out
