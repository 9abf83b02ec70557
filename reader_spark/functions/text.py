"""Text utilities: tag-strip fallback (C12), block detection (U10), and
corpus text-analysis functions (language-ID heuristic, quality scoring,
token counting, fingerprinting) for the large-scale pipeline ops.

C12 reference: the 5 copies of the same regex strip —
src/formatters/markdown.ts:53-60, src/scraper.ts:283-287,
src/engines/orchestrator.ts:68-73, src/engines/playwright/index.ts:228-235,
src/utils/block-detector.ts:97-104 — unified here once.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(r"<script[^>]*>[\s\S]*?</script>", re.IGNORECASE)
_STYLE_RE = re.compile(r"<style[^>]*>[\s\S]*?</style>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def strip_tags(html: str) -> str:
    """Regex tag-strip text extraction (C12)."""
    text = _SCRIPT_RE.sub("", html)
    text = _STYLE_RE.sub("", text)
    text = _TAG_RE.sub(" ", text)
    return _WS_RE.sub(" ", text).strip()


def detect_bot_page(
    html: str,
    patterns: tuple[str, ...],
    short_content_threshold: int = 500,
    long_content_signal_threshold: int = 3,
) -> bool:
    """detectBotPage — block-detector.ts:39-53 (signal counting over text)."""
    if not html or not html.strip() or not patterns:
        return False
    text = strip_tags(html)
    signals = 0
    for pattern in patterns:
        try:
            if re.search(pattern, text, re.IGNORECASE):
                signals += 1
        except re.error:
            continue
    if len(text) < short_content_threshold and signals >= 1:
        return True
    return signals >= long_content_signal_threshold


def detect_bot_title(title: str, title_patterns: tuple[str, ...]) -> bool:
    """detectBotTitle — block-detector.ts:60-64."""
    if not title or not title_patterns:
        return False
    for pattern in title_patterns:
        try:
            if re.search(pattern, title, re.IGNORECASE):
                return True
        except re.error:
            continue
    return False


def is_blocked_status(status_code: int) -> tuple[bool, str]:
    """HTTP-level block codes — block-detector.ts:79-82."""
    reasons = {
        401: "unauthorized",
        403: "forbidden",
        429: "rate_limited",
        503: "service_unavailable",
    }
    if status_code in reasons:
        return True, reasons[status_code]
    return False, ""


# ---------------------------------------------------------------------------
# Corpus text analysis (training-data pipeline extensions; not in reference)
# ---------------------------------------------------------------------------

# Tiny per-language stopword profiles for an n-gram/stopword heuristic
# language ID. Deterministic, dependency-free; real deployments would swap
# in fastText/CLD3 behind the same column contract.
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it for on are with as".split()),
    "es": frozenset("el la de que y en un ser se no por con para los".split()),
    "fr": frozenset("le la de et un être que pour dans ce il qui ne sur".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist".split()),
}

_TOKEN_RE = re.compile(r"[\w']+|[^\w\s]", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]")


def tokenize(text: str) -> list[str]:
    """BPE-ish regex tokenization: words + individual punctuation marks."""
    return _TOKEN_RE.findall(text)


def whitespace_token_count(text: str) -> int:
    return len(text.split())


def detect_language(text: str) -> str:
    """Stopword-vote language ID; 'und' when nothing matches."""
    words = set(text.lower().split())
    best_lang, best_hits = "und", 0
    for lang, stops in LANG_STOPWORDS.items():
        hits = len(words & stops)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def quality_score(text: str) -> float:
    """Length/punctuation/stopword-ratio quality heuristic in [0, 1]."""
    if not text:
        return 0.0
    words = text.split()
    n_words = len(words)
    if n_words == 0:
        return 0.0
    mean_word_len = sum(len(w) for w in words) / n_words
    punct_ratio = len(_PUNCT_RE.findall(text)) / max(len(text), 1)
    stop_hits = sum(1 for w in words if w.lower() in LANG_STOPWORDS["en"])
    stop_ratio = stop_hits / n_words
    length_factor = min(n_words / 100.0, 1.0)
    word_len_factor = 1.0 if 3.0 <= mean_word_len <= 10.0 else 0.5
    punct_factor = 1.0 if punct_ratio < 0.2 else 0.5
    return round(
        0.4 * length_factor
        + 0.2 * word_len_factor
        + 0.2 * punct_factor
        + 0.2 * min(stop_ratio * 4, 1.0),
        6,
    )


_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a_64(data: str) -> int:
    """FNV-1a 64-bit hash (public-domain algorithm) — deterministic across
    Python/Spark workers, used by fingerprinting/minhash/simhash."""
    h = _FNV_OFFSET
    for byte in data.encode("utf-8"):
        h ^= byte
        h = (h * _FNV_PRIME) & _MASK64
    return h


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Document fingerprint: min of FNV hashes over a rolling token window
    (winnowing-style, Schleimer et al., SIGMOD'03)."""
    tokens = text.split()
    if not tokens:
        return 0
    if len(tokens) <= window:
        return fnv1a_64(" ".join(tokens))
    return min(
        fnv1a_64(" ".join(tokens[i : i + window]))
        for i in range(len(tokens) - window + 1)
    )


def is_framework_error_page(html: str) -> bool:
    """U11 — isFrameworkErrorPage (playwright/index.ts:240-252): detect JS
    framework error-boundary pages that replaced the real content (the
    reference falls back to its SSR snapshot; a batch engine tags the row
    so the capture can be re-fetched or quarantined)."""
    lower = html.lower()
    return (
        "application error: a client-side exception has occurred" in lower
        or "there was an error while hydrating" in lower
        or ("__nuxt" in lower and "nuxt-error" in lower)
        or (
            "error boundary" in lower
            and "chunk" in lower
            and "<article" not in lower
        )
    )


def framework_error_col(html):
    """Native-Column twin of is_framework_error_page (pure contains/lower —
    whole-stage codegen, no UDF)."""
    from pyspark.sql import functions as F

    lower = F.lower(html)
    return (
        lower.contains("application error: a client-side exception has occurred")
        | lower.contains("there was an error while hydrating")
        | (lower.contains("__nuxt") & lower.contains("nuxt-error"))
        | (
            lower.contains("error boundary")
            & lower.contains("chunk")
            & ~lower.contains("<article")
        )
    )
