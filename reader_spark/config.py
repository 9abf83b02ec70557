"""Extractor configuration — the Spark re-expression of ``ScrapeOptions``.

Reference: ScrapeOptions /root/reference/src/types.ts:72-235, defaults
:414-461; CleaningOptions /root/reference/src/utils/content-cleaner.ts:25-38.
All caller-pluggable behavior is *data* (selector strings, regex strings,
thresholds), never Python callables — one frozen dataclass broadcast to every
pandas UDF so everything stays serializable and vectorizable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

# Reference: ALWAYS_REMOVE_SELECTORS content-cleaner.ts:43
ALWAYS_REMOVE_SELECTORS = ("script", "style", "noscript", "meta", "head")

# Reference: NAVIGATION_SELECTORS content-cleaner.ts:50-117 (exact matches
# only — no wildcards; the [class*="dialog"] Wikipedia regression is why).
NAVIGATION_SELECTORS = (
    "header", "footer", "nav", "aside",
    ".header", ".top", ".navbar", "#header",
    ".footer", ".bottom", "#footer",
    ".sidebar", ".side", ".aside", "#sidebar",
    ".modal", ".popup", "#modal", ".overlay",
    ".ad", ".ads", ".advert", "#ad",
    ".lang-selector", ".language", "#language-selector",
    ".social", ".social-media", ".social-links", "#social",
    ".menu", ".navigation", "#nav",
    ".breadcrumbs", "#breadcrumbs",
    ".share", "#share",
    ".widget", "#widget",
    ".cookie", "#cookie",
)

# Reference: FORCE_INCLUDE_SELECTORS content-cleaner.ts:125-135
FORCE_INCLUDE_SELECTORS = (
    "#main", "#content", "#main-content", "#mw-content-text", "#bodyContent",
    "main", "article", "[role='main']", "[data-page-content]",
)

MAX_HTML_SIZE = 2 * 1024 * 1024  # READER_MAX_HTML_SIZE default, scraper.ts:242
JSON_DETECTION_CAP = 500_000  # scraper.ts:431
EMPTY_MD_FALLBACK_MD_CHARS = 50  # scraper.ts:261-264
EMPTY_MD_FALLBACK_RAW_CHARS = 500


@dataclass(frozen=True)
class ExtractorConfig:
    """Broadcastable job configuration for the extraction pipeline."""

    only_main_content: bool = True
    remove_base64_images: bool = True
    include_tags: tuple[str, ...] = ()
    exclude_tags: tuple[str, ...] = ()
    navigation_selectors: tuple[str, ...] = ()  # merged with built-ins
    max_html_size: int = MAX_HTML_SIZE
    json_detection_cap: int = JSON_DETECTION_CAP

    # Block detection (U10) — reference ships no built-in patterns
    # (block-detector.ts:8-10); caller-provided regex strings.
    block_patterns: tuple[str, ...] = ()
    block_title_patterns: tuple[str, ...] = ()
    short_content_threshold: int = 500  # block-detector.ts:44
    long_content_signal_threshold: int = 3  # block-detector.ts:45

    # URL rewrite rules (U9): (pattern, replacement) regex pairs; first match
    # wins (url-rewriter.ts:42-63). Default empty = identity.
    url_rewrite_rules: tuple[tuple[str, str], ...] = ()

    # Readability-style scoring (delta (a), SURVEY.md §7): OFF by default so
    # the selector pipeline stays authoritative for fixture span-equality.
    readability_scoring: bool = False

    # Formatter registry (formats guard, src/types.ts:77,466-468):
    # 'markdown' (spans+markdown, always produced) and 'html' (cleaned HTML
    # passthrough, M3 formatters/html.ts:15-17). 'screenshot' is out of
    # scope for a batch engine (S7).
    formats: tuple[str, ...] = ("markdown",)

    def __post_init__(self) -> None:
        valid = {"markdown", "html"}
        bad = set(self.formats) - valid
        if bad:
            raise ValueError(f"unsupported formats: {sorted(bad)}")

    def nav_selectors(self) -> tuple[str, ...]:
        if self.navigation_selectors:
            return NAVIGATION_SELECTORS + self.navigation_selectors
        return NAVIGATION_SELECTORS


DEFAULT_CONFIG = ExtractorConfig()
