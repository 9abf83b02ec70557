"""Link extraction + crawl admission predicate (reference:
src/crawler.ts:200-267 extractLinks; src/utils/url-helpers.ts:292-443
shouldCrawlUrl). Pure-Python forms used inside Arrow batches; the filter
chain itself runs as native columns in the crawler dataflow."""

from __future__ import annotations

import re
from typing import Optional

from ..htmlkit.dom import parse_html
from ..htmlkit.selectors import query_all
from .urls import (
    get_url_key,
    is_content_url,
    is_same_domain,
    is_valid_url,
    resolve_url,
    should_include_url,
)

_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "blob:", "ftp:")


def extract_links(html: str, base_url: str) -> list[str]:
    """All candidate anchors from a page: skip fragments/non-HTTP schemes,
    resolve relative, strip hash (crawler.ts:211-246). Domain/content/
    pattern/robots filters are applied by the caller (they are data-parallel
    column predicates in the Spark dataflow)."""
    out: list[str] = []
    seen: set[str] = set()
    document = parse_html(html)
    for anchor in query_all(document, "a[href]"):
        href = (anchor.attrs.get("href") or "").strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        resolved = resolve_url(href, base_url)
        if not resolved or not is_valid_url(resolved):
            continue
        resolved = re.sub(r"#.*$", "", resolved)
        if resolved not in seen:
            seen.add(resolved)
            out.append(resolved)
    return out


# shouldCrawlUrl's skip lists (url-helpers.ts:319-421). NOTE the reference
# checks extensions with substring `includes`, not endswith — ported as-is.
SKIP_EXTENSIONS = (
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx",
    ".zip", ".rar", ".tar", ".gz", ".exe", ".dmg", ".pkg", ".deb",
    ".rpm", ".apk", ".ipa",
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".svg", ".webp", ".ico",
    ".favicon",
    ".mp4", ".avi", ".mov", ".wmv", ".flv", ".webm",
    ".mp3", ".wav", ".ogg", ".m4a", ".aac",
    ".woff", ".woff2", ".ttf", ".otf", ".eot",
    ".css", ".js", ".mjs", ".ts", ".jsx", ".tsx",
    ".json", ".xml", ".txt", ".md", ".rss", ".atom", ".sitemap",
    ".robots", ".webmanifest",
    ".bz2", ".7z",
)

SKIP_PATTERNS = [
    r"/(uploads|assets|files|static|media|resources)/",
    r"/(admin|login|auth|account|dashboard|profile|settings)/",
    r"/(api|graphql|rest|ws:|webhook)/",
    r"/(analytics|tracking|pixel|beacon|ads)/",
    r"/(test|dev|staging|beta|demo)/",
    r"/(search|cart|checkout|payment|subscription)/",
    r"/(facebook|twitter|instagram|youtube|linkedin|github)/",
    r"/(privacy|terms|tos|legal|cookie|gdpr|disclaimer|imprint|impressum)\b",
    r"/(privacy-policy|terms-of-service|terms-of-use|terms-and-conditions)\b",
    r"/(cookie-policy|data-protection|acceptable-use|user-agreement)\b",
    r"/(refund|cancellation|shipping|return)-?(policy)?\b",
    r"/(contact|support|help|faq|feedback)/?$",
    r"/(about-us|careers|jobs|press|investors|team)/?$",
]
_SKIP_PATTERNS_RE = re.compile("|".join(SKIP_PATTERNS), re.IGNORECASE)

QUERY_PARAM_BLACKLIST = (
    "download", "file", "attachment", "export", "print", "share", "email",
)


def should_crawl_url(
    url: str,
    base_url: str,
    max_depth: int,
    current_depth: int,
    visited: set[str],
) -> bool:
    """shouldCrawlUrl — url-helpers.ts:292-443 (U7): the full admission
    predicate composition."""
    if current_depth > max_depth:
        return False
    if get_url_key(url) in visited:
        return False
    if not is_same_domain(url, base_url):
        return False
    lower = url.lower()
    if any(ext in lower for ext in SKIP_EXTENSIONS):
        return False
    if _SKIP_PATTERNS_RE.search(url):
        return False
    if "?" in url and any(p in lower for p in QUERY_PARAM_BLACKLIST):
        return False
    # Very short URLs (likely navigation/utility): url-helpers.ts:438
    if (
        len([p for p in url.split("/") if p]) < 2
        and len(url.split("?")[0].split("/")) <= 2
    ):
        return False
    return True


def admit_link(
    url: str,
    seed_url: str,
    include_patterns: Optional[list[str]] = None,
    exclude_patterns: Optional[list[str]] = None,
) -> bool:
    """The crawler's per-link filter chain after extraction
    (crawler.ts:247-260): same-domain, content-URL, include/exclude."""
    return (
        is_same_domain(url, seed_url)
        and is_content_url(url)
        and should_include_url(url, include_patterns, exclude_patterns)
    )
