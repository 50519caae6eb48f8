"""HTML parsing with the reference parser's exact observable semantics.

Re-implements (from the published behavior, not the code) what the reference
computes with BeautifulSoup in ``Crawler/crawler.py``:

- title: ``soup.title.string.strip()[:500]``            (crawler.py:460-462)
- metadata: 10 string fields, '' defaults, per-field caps (crawler.py:268-331)
- headings: h1-h6 lists; drop empty / >500-char; cap 20  (crawler.py:333-350)
- content: strip script/style/noscript; paragraphs >10 chars; whitespace
  collapse; counts — note word_count/char_count are over the UNTRUNCATED text
  while content_text is capped at 10,000 chars        (crawler.py:352-396)
- links: anchors in document order → urlnorm.extract_links (crawler.py:398-449)

BeautifulSoup/lxml are not available in this container; a regex parser is exact
on the regular grammar ``htmlgen`` emits (generated text contains no markup
characters). On arbitrary web HTML you would swap in an HTML5 parser behind the
same function signature — the Spark plumbing (pandas-UDF batch shape, output
struct schema) is identical either way.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from .urlnorm import ExtractedLink, extract_links

TITLE_CAP = 500
CONTENT_TEXT_CAP = 10_000
HEADING_CAP = 500
HEADINGS_PER_LEVEL = 20

META_CAPS = {
    "description": 500,
    "keywords": 200,
    "og_title": 200,
    "og_description": 500,
    "og_image": 200,
    "og_url": 200,
    "viewport": 200,
    "charset": 50,
    "author": 100,
    "robots": 100,
}
META_FIELDS = tuple(META_CAPS)

_RE_TITLE = re.compile(r"<title>(.*?)</title>", re.S)
_RE_META_NAME = re.compile(r'<meta name="([a-z]+)" content="(.*?)">')
_RE_META_PROP = re.compile(r'<meta property="og:([a-z_]+)" content="(.*?)">')
_RE_META_CHARSET = re.compile(r'<meta charset="(.*?)">')
_RE_HEADING = re.compile(r"<h([1-6])>(.*?)</h\1>", re.S)
_RE_PARA = re.compile(r"<p>(.*?)</p>", re.S)
_RE_STRIP_BLOCKS = re.compile(r"<(script|style|noscript)\b.*?</\1>", re.S)
_RE_ANCHOR = re.compile(r'<a href="(.*?)"(?: title="(.*?)")?>(.*?)</a>', re.S)
_RE_ANCHOR_COUNT = re.compile(r"<a [^>]*href=")
_RE_IMG = re.compile(r"<img\b")
_RE_IMG_PAYLOAD = re.compile(r'<img src="/img/(im[0-9a-f]+)\.bin" alt="(.*?)">')
_RE_FORM = re.compile(r"<form\b")
_RE_WS = re.compile(r"\s+")


@dataclass
class ParsedPage:
    url: str  # unquoted page URL (reference stores unquote(url), crawler.py:475)
    title: str
    metadata: dict[str, str]
    headings: dict[str, list[str]]
    content: dict[str, object]
    links: list[ExtractedLink]


def parse_title(html: str) -> str:
    m = _RE_TITLE.search(html)
    return m.group(1).strip()[:TITLE_CAP] if m else ""


def parse_metadata(html: str) -> dict[str, str]:
    meta = {f: "" for f in META_FIELDS}
    for name, content in _RE_META_NAME.findall(html):
        if name in meta and content:
            meta[name] = content[: META_CAPS[name]]
    for prop, content in _RE_META_PROP.findall(html):
        key = "og_" + prop
        if key in meta and content:
            meta[key] = content[: META_CAPS[key]]
    m = _RE_META_CHARSET.search(html)
    if m:
        meta["charset"] = m.group(1)[: META_CAPS["charset"]]
    return meta


def parse_headings(html: str) -> dict[str, list[str]]:
    headings: dict[str, list[str]] = {f"h{i}": [] for i in range(1, 7)}
    for lvl, text in _RE_HEADING.findall(html):
        t = text.strip()
        if t and len(t) <= HEADING_CAP:
            headings[f"h{lvl}"].append(t)
    for k in headings:
        headings[k] = headings[k][:HEADINGS_PER_LEVEL]
    return headings


def parse_content(html: str) -> dict[str, object]:
    stripped = _RE_STRIP_BLOCKS.sub("", html)
    text_parts = []
    for raw in _RE_PARA.findall(stripped):
        t = raw.strip()
        if t and len(t) > 10:  # reference drops very short paragraphs
            text_parts.append(t)
    full_text = _RE_WS.sub(" ", " ".join(text_parts))
    return {
        "content_text": full_text[:CONTENT_TEXT_CAP],
        # reference quirk: counts are over the untruncated text (crawler.py:376-384)
        "word_count": len(full_text.split()) if full_text else 0,
        "char_count": len(full_text),
        "links_count": len(_RE_ANCHOR_COUNT.findall(stripped)),
        "images_count": len(_RE_IMG.findall(stripped)),
        "forms_count": len(_RE_FORM.findall(stripped)),
        "paragraphs_count": len(text_parts),
    }


def parse_payload(html: str) -> tuple[Optional[str], Optional[str]]:
    """(image_id, caption) from the page's payload <img> tag (the image+caption
    pair the graft's input_hint centers on); (None, None) if absent."""
    m = _RE_IMG_PAYLOAD.search(html)
    return (m.group(1), m.group(2)) if m else (None, None)


def parse_raw_anchors(html: str) -> list[tuple[str, str, Optional[str]]]:
    """(href, text, title_attr) for every anchor, in document order."""
    return [
        (href, text, title or None) for href, title, text in _RE_ANCHOR.findall(html)
    ]


def parse_page(html: str, url: str, domain: str) -> ParsedPage:
    """Full page parse — the batch analog of the reference's ``parse_page``
    6-tuple (crawler.py:451-480)."""
    from urllib.parse import unquote

    raw = [(h, t, ta) for h, t, ta in parse_raw_anchors(html)]
    return ParsedPage(
        url=unquote(url),
        title=parse_title(html),
        metadata=parse_metadata(html),
        headings=parse_headings(html),
        content=parse_content(html),
        links=extract_links(raw, url, domain),
    )
