"""URL validation/normalization (reference: src/utils/url-helpers.ts).

Pure-Python versions used inside Arrow batches, mirroring WHATWG ``new URL``
semantics where the reference depends on them (empty path serializes as "/",
default ports dropped). Several of these also have native-Column twins in
``reader_spark.spark.columns`` so Catalyst can push them down when they are
used as standalone dataset operators.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urljoin, urlsplit, urlunsplit


def _serialize(parts) -> str:
    """WHATWG-ish serialization: empty path on http(s) becomes '/'."""
    scheme, netloc, path, query, fragment = parts
    if scheme in ("http", "https") and path == "":
        path = "/"
    return urlunsplit((scheme, netloc, path, query, fragment))


# One-slot (base -> origin) cache: inside an extraction batch every [src]/
# [href] of a document resolves against the same base_url, so the split of
# the base amortizes to ~once per document. Workers are single-threaded per
# Python process (one task at a time), so a module global is safe.
_ORIGIN_CACHE: tuple[str, Optional[str]] = ("", None)


def resolve_url(relative: str, base: str) -> str:
    """resolveUrl — url-helpers.ts:10-16 (returns input on failure)."""
    # Fast path: root-relative refs ("/x/y?q#f") against an http(s) base
    # join to origin + ref verbatim — no split/unsplit round-trip needed.
    # Tabs/newlines fall through (urlsplit strips them per WHATWG), and so
    # do dot segments ("/a/../b", "/./x", trailing "/." or "/..") — the
    # slow path's urljoin removes them per RFC 3986, and new URL() in the
    # reference does too, so returning them verbatim would diverge.
    if (
        relative.startswith("/")
        and not relative.startswith("//")
        and "\t" not in relative
        and "\n" not in relative
        and "\r" not in relative
        and "/./" not in relative
        and "/../" not in relative
        and not relative.endswith(("/.", "/.."))
    ):
        global _ORIGIN_CACHE
        cached_base, origin = _ORIGIN_CACHE
        if cached_base != base:
            try:
                parts = urlsplit(base)
                origin = (
                    f"{parts.scheme}://{parts.netloc}"
                    if parts.scheme in ("http", "https") and parts.netloc
                    else None
                )
            except Exception:
                origin = None
            _ORIGIN_CACHE = (base, origin)
        if origin is not None:
            return origin + relative
    try:
        return _serialize(urlsplit(urljoin(base, relative)))
    except Exception:
        return relative


def is_valid_url(url: str) -> bool:
    """isValidUrl — url-helpers.ts:21-28 (any scheme parses)."""
    try:
        parts = urlsplit(url)
        return bool(parts.scheme)
    except Exception:
        return False


def normalize_url(url: str, base_url: Optional[str] = None) -> str:
    """normalizeUrl — url-helpers.ts:33-52: resolve + strip fragment.

    Raises ValueError on invalid input like the reference throws.
    """
    if url.startswith(("http://", "https://")):
        absolute = url
    elif base_url:
        absolute = urljoin(base_url, url)
    else:
        raise ValueError(f"Invalid URL: {url}")
    try:
        scheme, netloc, path, query, _ = urlsplit(absolute)
    except Exception as exc:  # pragma: no cover
        raise ValueError(f"Invalid URL: {url}") from exc
    if scheme not in ("http", "https") or not netloc:
        raise ValueError(f"Invalid URL: {url}")
    return _serialize((scheme, netloc, path, query, ""))


def extract_base_domain(url: str) -> str:
    """extractBaseDomain — url-helpers.ts:57-64."""
    host = urlsplit(url).hostname
    if not host:
        raise ValueError(f"Invalid URL for domain extraction: {url}")
    return host


def is_same_domain(url: str, base_url: str) -> bool:
    """isSameDomain — url-helpers.ts:73-82 (strict host match, www stripped)."""
    try:
        u = extract_base_domain(url).removeprefix("www.")
        b = extract_base_domain(base_url).removeprefix("www.")
        return u == b
    except Exception:
        return False


_INDEX_FILES = ("index.html", "index.htm", "default.html", "default.htm", "index.php")


def get_url_key(url: str) -> str:
    """getUrlKey — url-helpers.ts:95-137: canonical dedup key.

    Strips hash+query, www., default ports, index files; lowercases;
    strips trailing slash except root.
    """
    try:
        scheme, netloc, path, _query, _frag = urlsplit(url)
        if not scheme or not netloc:
            return url.lower()
        host = (urlsplit(url).hostname or "").removeprefix("www.")
        port = urlsplit(url).port
        if port and not (
            (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
        ):
            host = f"{host}:{port}"
        for index_file in _INDEX_FILES:
            if path.endswith("/" + index_file):
                path = path[: -len(index_file)]
                break
        normalized = _serialize((scheme, host, path, "", "")).lower()
        if normalized.endswith("/") and path != "/" and path != "":
            normalized = normalized[:-1]
        return normalized
    except Exception:
        return url.lower()


def validate_urls(urls: list[str]) -> tuple[bool, list[str], list[dict[str, str]]]:
    """validateUrls — url-helpers.ts:142-197. Returns (is_valid, valid, errors)."""
    valid: list[str] = []
    errors: list[dict[str, str]] = []
    if not urls:
        return False, [], [{"url": "", "error": "At least one URL is required"}]
    for url in urls:
        if not isinstance(url, str) or not url:
            errors.append({"url": str(url), "error": "URL must be a non-empty string"})
            continue
        trimmed = url.strip()
        if not trimmed:
            errors.append({"url": str(url), "error": "URL cannot be empty"})
            continue
        if not is_valid_url(trimmed):
            errors.append({"url": trimmed, "error": "Invalid URL format"})
            continue
        if not trimmed.startswith(("http://", "https://")):
            errors.append(
                {"url": trimmed, "error": "URL must start with http:// or https://"}
            )
            continue
        valid.append(trimmed)
    unique = list(dict.fromkeys(valid))
    return bool(unique) and not errors, unique, errors


def matches_patterns(url: str, patterns: list[str]) -> bool:
    """matchesPatterns — url-helpers.ts:205-219 (case-insensitive, bad regex skipped)."""
    if not patterns:
        return False
    for pattern in patterns:
        try:
            if re.search(pattern, url, re.IGNORECASE):
                return True
        except re.error:
            continue
    return False


def should_include_url(
    url: str,
    include_patterns: Optional[list[str]] = None,
    exclude_patterns: Optional[list[str]] = None,
) -> bool:
    """shouldIncludeUrl — url-helpers.ts:226-246."""
    if include_patterns and not matches_patterns(url, include_patterns):
        return False
    if exclude_patterns and matches_patterns(url, exclude_patterns):
        return False
    return True


_NON_CONTENT_PATTERNS = [
    r"/(privacy|terms|tos|legal|cookie|gdpr|disclaimer|imprint|impressum)\b",
    r"/(privacy-policy|terms-of-service|terms-of-use|terms-and-conditions)\b",
    r"/(cookie-policy|data-protection|acceptable-use|user-agreement)\b",
    r"/(refund|cancellation|shipping|return)-?(policy)?\b",
    r"/(contact|support|help|faq|feedback)/?$",
    r"/(about-us|careers|jobs|press|investors|team)/?$",
    r"/(admin|login|auth|account|dashboard|profile|settings)/",
    r"/(cart|checkout|payment|subscription|wishlist)/",
    r"/(uploads|assets|files|static|media|resources)/",
    r"/(api|graphql|rest|webhook)/",
]
_NON_CONTENT_RE = re.compile("|".join(_NON_CONTENT_PATTERNS), re.IGNORECASE)
_SKIP_EXTENSIONS = (".pdf", ".doc", ".docx", ".xls", ".xlsx", ".zip", ".exe")


def is_content_url(url: str) -> bool:
    """isContentUrl — url-helpers.ts:252-287 (12 path regexes + 7 extensions).

    The alternation is folded into ONE compiled regex — the same fold the
    Spark-native twin uses so a single ``rlike`` suffices.
    """
    lower = url.lower()
    if _NON_CONTENT_RE.search(lower):
        return False
    if lower.endswith(_SKIP_EXTENSIONS):
        return False
    return True


def rewrite_url(url: str, rules: tuple[tuple[str, str], ...]) -> str:
    """rewriteUrl — url-rewriter.ts:42-63: the FIRST matching rule rewrites.

    The reference's rules are (match, rewrite) callbacks; the data-driven
    Spark form is (pattern, template) pairs where the template (with \\N
    backrefs expanded from the match) becomes the whole rewritten URL.
    """
    for pattern, replacement in rules:
        try:
            m = re.search(pattern, url, re.IGNORECASE)
        except re.error:
            continue
        if m:
            return m.expand(replacement)
    return url
