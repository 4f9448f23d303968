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


def parse_document(html: bytes | str, base_url: str) -> tuple[list[str], str, bool]:
    """Parse one document -> (links, text, meta_nofollow).

    ``links`` is empty when meta_nofollow is set (the reference skips link
    extraction for the whole document); ``text`` is always extracted (the
    FetchResultConsumer runs regardless of robots meta, SURVEY.md A7).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _DocParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return [], "", False
    text = p.text()
    if p.meta_nofollow:
        return [], text, True

    links: list[str] = []
    seen: set[str] = set()
    for href in p.hrefs:
        absolute = urljoin(base_url, href.strip())
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
