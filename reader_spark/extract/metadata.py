"""X1-X11: website metadata battery (reference: src/utils/metadata-extractor.ts).

Runs on the RAW document (before cleaning — ordering contract asserted by
tests/unit/scraper-pipeline.test.ts:81-88). Returns a plain nested dict
matching the ``WebsiteMetadata`` struct (src/types.ts:240-280), which maps
1:1 onto the Spark StructType in reader_spark.spark.schemas.

Performance: ONE tree walk collects every <meta>/<link>/<title> lookup the
battery needs (the reference issues ~25 querySelector scans per document);
each extractor then reads from the collected index. First-match-in-document-
order semantics are preserved.
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

from ..functions.urls import normalize_url
from ..htmlkit.dom import Node, parse_html
from ..htmlkit.selectors import query_all

_CHARSET_RE = re.compile(r"charset=([^\s;]+)", re.IGNORECASE)

OPEN_GRAPH_FIELDS = ("title", "description", "type", "url", "image", "siteName", "locale")
TWITTER_FIELDS = ("card", "site", "creator", "title", "description", "image")


class _HeadIndex:
    """Single-walk collection of metadata-relevant nodes."""

    __slots__ = ("by_name", "by_property", "charset", "http_equiv_content",
                 "links", "title_text", "html_lang")

    def __init__(self, document: Node):
        self.by_name: dict[str, str] = {}
        self.by_property: dict[str, str] = {}
        self.charset: Optional[str] = None
        self.http_equiv_content: Optional[str] = None
        self.links: list[tuple[str, str]] = []  # (rel, href) in doc order
        self.title_text: Optional[str] = None
        self.html_lang: Optional[str] = None
        for node in document.walk_elements():
            tag = node.tag
            if tag == "meta":
                attrs = node.attrs
                content = attrs.get("content")
                name = attrs.get("name")
                if name and content and name not in self.by_name:
                    self.by_name[name] = content
                prop = attrs.get("property")
                if prop and content and prop not in self.by_property:
                    self.by_property[prop] = content
                if self.charset is None and attrs.get("charset"):
                    self.charset = attrs["charset"]
                if (
                    self.http_equiv_content is None
                    and (attrs.get("http-equiv") or "").lower() == "content-type"
                    and content
                ):
                    self.http_equiv_content = content
            elif tag == "link":
                rel = node.attrs.get("rel")
                href = node.attrs.get("href")
                if rel and href:
                    self.links.append((rel, href))
            elif tag == "title" and self.title_text is None:
                self.title_text = node.text_content()
            elif tag == "html" and self.html_lang is None:
                self.html_lang = node.attrs.get("lang")

    def meta(self, name: str) -> Optional[str]:
        """X2 — extractMetaContent (:80-96): meta[name=] then meta[property=]."""
        content = self.by_name.get(name)
        if content:
            return content.strip()
        content = self.by_property.get(name)
        if content:
            return content.strip()
        return None

    def first_link(self, rel_exact: Optional[str] = None, rel_contains: Optional[str] = None) -> Optional[str]:
        for rel, href in self.links:
            if rel_exact is not None and rel == rel_exact:
                return href
            if rel_contains is not None and rel_contains in rel:
                return href
        return None


def _favicon(idx: _HeadIndex, base_url: str) -> Optional[str]:
    """X5 — extractFavicon (:133-158): 4 selectors in order, then /favicon.ico."""
    href = (
        idx.first_link(rel_exact="icon")
        or idx.first_link(rel_exact="shortcut icon")
        or idx.first_link(rel_exact="apple-touch-icon")
        or idx.first_link(rel_contains="icon")
    )
    if href:
        try:
            return normalize_url(href, base_url)
        except ValueError:
            return None
    try:
        return normalize_url("/favicon.ico", base_url)
    except ValueError:
        return None


def _canonical(idx: _HeadIndex, base_url: str) -> Optional[str]:
    """X6 — extractCanonical (:163-173)."""
    href = idx.first_link(rel_exact="canonical")
    if href:
        try:
            return normalize_url(href, base_url)
        except ValueError:
            return None
    return None


def _charset(idx: _HeadIndex) -> Optional[str]:
    """X4 — extractCharset (:109-128)."""
    if idx.charset and idx.charset.strip():
        return idx.charset.strip()
    if idx.http_equiv_content:
        m = _CHARSET_RE.search(idx.http_equiv_content)
        if m:
            return m.group(1).strip()
    return None


def _keywords(idx: _HeadIndex) -> Optional[list[str]]:
    """X7 — extractKeywords (:178-188): split ',', trim, drop empties."""
    content = idx.meta("keywords")
    if not content:
        return None
    return [kw.strip() for kw in content.split(",") if kw.strip()]


def extract_metadata_dom(document: Node, base_url: str) -> dict[str, Any]:
    return _metadata_from_index(_HeadIndex(document), base_url)


def extract_metadata_stream(html: str, base_url: str) -> dict[str, Any]:
    """Metadata battery via the STREAMING head-index scan — no tree build.

    Used on the oversized-document path (pipeline C10): the ordering
    contract wants metadata from the full raw document, and a full-tree
    parse of a multi-MiB payload exists only to serve this battery. The
    scan sees start tags in source order == walk_elements() preorder, so
    output is identical to extract_metadata_dom(parse_html(html)) (pinned
    by tests). Falls back to the tree path on any scanner error."""
    try:
        from ..htmlkit.fast_parser import scan_head_index

        idx = scan_head_index(html)
    except Exception:
        idx = _HeadIndex(parse_html(html))
    return _metadata_from_index(idx, base_url)


def _metadata_from_index(idx, base_url: str) -> dict[str, Any]:
    title = (idx.title_text or "").strip() or idx.meta("og:title")  # X1
    language = (idx.html_lang or "").strip() or None  # X3

    og = {  # X8 — all-null collapses to None
        "title": idx.meta("og:title"),
        "description": idx.meta("og:description"),
        "type": idx.meta("og:type"),
        "url": idx.meta("og:url"),
        "image": idx.meta("og:image"),
        "siteName": idx.meta("og:site_name"),
        "locale": idx.meta("og:locale"),
    }
    tw = {  # X9 — all-null collapses to None
        "card": idx.meta("twitter:card"),
        "site": idx.meta("twitter:site"),
        "creator": idx.meta("twitter:creator"),
        "title": idx.meta("twitter:title"),
        "description": idx.meta("twitter:description"),
        "image": idx.meta("twitter:image"),
    }

    return {
        "title": title or None,
        "description": idx.meta("description"),
        "author": idx.meta("author"),
        "language": language,
        "charset": _charset(idx),
        "favicon": _favicon(idx, base_url),
        "canonical": _canonical(idx, base_url),
        # X11 — image fallback chain (:45-46)
        "image": idx.meta("og:image") or idx.meta("twitter:image"),
        "keywords": _keywords(idx),
        "robots": idx.meta("robots"),
        "themeColor": idx.meta("theme-color"),
        "openGraph": og if any(og.values()) else None,
        "twitter": tw if any(tw.values()) else None,
    }


def extract_metadata(html: str, base_url: str) -> dict[str, Any]:
    """extractMetadata — metadata-extractor.ts:9-11."""
    return extract_metadata_dom(parse_html(html), base_url)


def extract_structured_data(html: str) -> list[Any]:
    """X10 — extractStructuredData (:251-265): every ld+json script parsed."""
    document = parse_html(html)
    out: list[Any] = []
    for script in query_all(document, "script[type='application/ld+json']"):
        try:
            out.append(json.loads(script.text_content() or ""))
        except (json.JSONDecodeError, ValueError):
            continue
    return out
