"""X1-X11: website metadata battery (reference: src/utils/metadata-extractor.ts).

Runs on the RAW document (before cleaning — ordering contract asserted by
tests/unit/scraper-pipeline.test.ts:81-88). Returns a plain nested dict
matching the ``WebsiteMetadata`` struct (src/types.ts:240-280), which maps
1:1 onto the Spark StructType in reader_spark.spark.schemas.
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

from ..functions.urls import normalize_url
from ..htmlkit.dom import Node, parse_html
from ..htmlkit.selectors import query_all, query_first

_CHARSET_RE = re.compile(r"charset=([^\s;]+)", re.IGNORECASE)

OPEN_GRAPH_FIELDS = ("title", "description", "type", "url", "image", "siteName", "locale")
TWITTER_FIELDS = ("card", "site", "creator", "title", "description", "image")


def _meta_content(document: Node, name: str) -> Optional[str]:
    """X2 — extractMetaContent (:80-96): meta[name=] then meta[property=]."""
    for attr in ("name", "property"):
        el = query_first(document, f"meta[{attr}='{name}']")
        if el is not None:
            content = el.attrs.get("content")
            if content:
                return content.strip()
    return None


def _title(document: Node) -> Optional[str]:
    """X1 — extractTitle (:65-74): <title> text, fallback og:title."""
    el = document.find_first("title")
    if el is not None:
        text = el.text_content().strip()
        if text:
            return text
    return _meta_content(document, "og:title")


def _language(document: Node) -> Optional[str]:
    """X3 — extractLanguage (:101-104): html[lang]."""
    html_el = document.find_first("html")
    if html_el is not None:
        lang = (html_el.attrs.get("lang") or "").strip()
        if lang:
            return lang
    return None


def _charset(document: Node) -> Optional[str]:
    """X4 — extractCharset (:109-128)."""
    el = query_first(document, "meta[charset]")
    if el is not None:
        charset = (el.attrs.get("charset") or "").strip()
        if charset:
            return charset
    el = query_first(document, "meta[http-equiv='Content-Type']")
    if el is not None:
        content = el.attrs.get("content") or ""
        m = _CHARSET_RE.search(content)
        if m:
            return m.group(1).strip()
    return None


def _favicon(document: Node, base_url: str) -> Optional[str]:
    """X5 — extractFavicon (:133-158): 4 selectors then /favicon.ico."""
    for selector in (
        "link[rel='icon']",
        "link[rel='shortcut icon']",
        "link[rel='apple-touch-icon']",
        "link[rel*='icon']",
    ):
        el = query_first(document, selector)
        if el is not None:
            href = el.attrs.get("href")
            if href:
                try:
                    return normalize_url(href, base_url)
                except ValueError:
                    return None
    try:
        return normalize_url("/favicon.ico", base_url)
    except ValueError:
        return None


def _canonical(document: Node, base_url: str) -> Optional[str]:
    """X6 — extractCanonical (:163-173)."""
    el = query_first(document, "link[rel='canonical']")
    if el is not None:
        href = el.attrs.get("href")
        if href:
            try:
                return normalize_url(href, base_url)
            except ValueError:
                return None
    return None


def _keywords(document: Node) -> Optional[list[str]]:
    """X7 — extractKeywords (:178-188): split ',', trim, drop empties."""
    content = _meta_content(document, "keywords")
    if not content:
        return None
    keywords = [kw.strip() for kw in content.split(",")]
    return [kw for kw in keywords if kw]


def _open_graph(document: Node) -> Optional[dict[str, Optional[str]]]:
    """X8 — extractOpenGraph (:193-218): all-null -> None."""
    og = {
        "title": _meta_content(document, "og:title"),
        "description": _meta_content(document, "og:description"),
        "type": _meta_content(document, "og:type"),
        "url": _meta_content(document, "og:url"),
        "image": _meta_content(document, "og:image"),
        "siteName": _meta_content(document, "og:site_name"),
        "locale": _meta_content(document, "og:locale"),
    }
    return og if any(og.values()) else None


def _twitter(document: Node) -> Optional[dict[str, Optional[str]]]:
    """X9 — extractTwitterCard (:223-246): all-null -> None."""
    tw = {
        "card": _meta_content(document, "twitter:card"),
        "site": _meta_content(document, "twitter:site"),
        "creator": _meta_content(document, "twitter:creator"),
        "title": _meta_content(document, "twitter:title"),
        "description": _meta_content(document, "twitter:description"),
        "image": _meta_content(document, "twitter:image"),
    }
    return tw if any(tw.values()) else None


def extract_metadata_dom(document: Node, base_url: str) -> dict[str, Any]:
    return {
        "title": _title(document),
        "description": _meta_content(document, "description"),
        "author": _meta_content(document, "author"),
        "language": _language(document),
        "charset": _charset(document),
        "favicon": _favicon(document, base_url),
        "canonical": _canonical(document, base_url),
        # X11 — image fallback chain (:45-46): coalesce(og:image, twitter:image)
        "image": _meta_content(document, "og:image")
        or _meta_content(document, "twitter:image"),
        "keywords": _keywords(document),
        "robots": _meta_content(document, "robots"),
        "themeColor": _meta_content(document, "theme-color"),
        "openGraph": _open_graph(document),
        "twitter": _twitter(document),
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
