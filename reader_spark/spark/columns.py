"""Native Column expressions for operators that don't need a DOM.

These are the JVM-side (whole-stage-codegen'd) twins of the pure-Python
helpers — used when the operator runs as a standalone dataset transform, so
Catalyst can push filters into the scan and no Python hop happens at all.

Reference semantics: url-helpers.ts (U1-U6), block-detector.ts stripTags
(C12), formatters/postprocess.ts (M2 passes 1 & 3-4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_tags_col(html: Column) -> Column:
    """C12 tag-strip text extraction as chained native regexp_replace."""
    no_script = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", "")
    no_style = F.regexp_replace(no_script, r"(?is)<style[^>]*>.*?</style>", "")
    no_tags = F.regexp_replace(no_style, r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def url_key_col(url: Column) -> Column:
    """U3 dedup key (getUrlKey, url-helpers.ts:95-137) as native expressions:
    strip fragment+query, www., default ports, index files; lowercase; strip
    trailing slash (root keeps it)."""
    u = F.lower(url)
    u = F.regexp_replace(u, r"[#?].*$", "")  # fragment + query
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")  # www.
    u = F.regexp_replace(u, r"^(https://[^/]+):443(/|$)", r"$1$2")  # default ports
    u = F.regexp_replace(u, r"^(http://[^/]+):80(/|$)", r"$1$2")
    u = F.regexp_replace(
        u, r"/(index\.html|index\.htm|default\.html|default\.htm|index\.php)$", "/"
    )
    # bare origin -> origin/ (WHATWG serialization), then strip non-root
    # trailing slash.
    u = F.when(u.rlike(r"^https?://[^/]+$"), F.concat(u, F.lit("/"))).otherwise(u)
    u = F.when(u.rlike(r"^https?://[^/]+/$"), u).otherwise(
        F.regexp_replace(u, r"/$", "")
    )
    return u


def host_key_col(url: Column) -> Column:
    """U4 same-domain key: hostname with www. stripped."""
    host = F.regexp_extract(url, r"^https?://([^/:?#]+)", 1)
    return F.regexp_replace(F.lower(host), r"^www\.", "")


_NON_CONTENT_ALTERNATION = (
    r"/(privacy|terms|tos|legal|cookie|gdpr|disclaimer|imprint|impressum)\b"
    r"|/(privacy-policy|terms-of-service|terms-of-use|terms-and-conditions)\b"
    r"|/(cookie-policy|data-protection|acceptable-use|user-agreement)\b"
    r"|/(refund|cancellation|shipping|return)-?(policy)?\b"
    r"|/(contact|support|help|faq|feedback)/?$"
    r"|/(about-us|careers|jobs|press|investors|team)/?$"
    r"|/(admin|login|auth|account|dashboard|profile|settings)/"
    r"|/(cart|checkout|payment|subscription|wishlist)/"
    r"|/(uploads|assets|files|static|media|resources)/"
    r"|/(api|graphql|rest|webhook)/"
)

_SKIP_EXT_ALTERNATION = r"\.(pdf|doc|docx|xls|xlsx|zip|exe)$"


def is_content_url_col(url: Column) -> Column:
    """U6 content-URL heuristic: the 12 path regexes folded into ONE rlike
    alternation + extension check — a single codegen'd predicate."""
    lower = F.lower(url)
    return ~lower.rlike(_NON_CONTENT_ALTERNATION) & ~lower.rlike(_SKIP_EXT_ALTERNATION)


def postprocess_markdown_col(md: Column) -> Column:
    """M2 passes 1, 3, 4 as native regexp_replace chains (pass 2 — image-link
    dedup — needs a backreference comparison, kept in the UDF path)."""
    out = F.regexp_replace(
        md, r"(?i)\[(Skip|Jump) to (main )?Content\]\(#[^)]*\)", ""
    )
    out = F.regexp_replace(out, r"\n{3,}", "\n\n")
    return F.trim(out)


def whitespace_token_count_col(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


# PDF text extractors emit Unicode presentation-form ligatures the font
# embedded (U+FB00..FB06); training corpora and search indexes want the
# ASCII letter sequences (the NFKC compatibility decomposition of
# exactly these seven code points, applied without NFKC's other
# transforms — superscripts, fractions and width folds stay intact).
PDF_LIGATURES = (
    ("ﬀ", "ff"),
    ("ﬁ", "fi"),
    ("ﬂ", "fl"),
    ("ﬃ", "ffi"),
    ("ﬄ", "ffl"),
    ("ﬅ", "st"),  # ﬅ long s + t
    ("ﬆ", "st"),
)


def fold_ligatures_col(text: Column) -> Column:
    """Replace the seven Latin presentation-form ligatures with their
    letter sequences — a chain of literal replaces riding the scan
    (whole-stage codegen, no regex, no Python). Composes after the PDF
    layout parse (pdf/layout.py) the same way dehyphenation does."""
    out = text
    for lig, repl in PDF_LIGATURES:
        out = F.replace(out, F.lit(lig), F.lit(repl))
    return out


# Typographic variants that make byte-identical content hash apart
# across sites (curly quotes, en/em dashes, ellipsis, nbsp). Folding
# them is standard pre-dedup normalization: near-dup recall improves
# without touching real content. Single code points -> ASCII, so the
# chain cannot interact with itself or with the ligature fold.
TYPOGRAPHY_FOLDS = (
    ("‘", "'"),
    ("’", "'"),
    ("“", '"'),
    ("”", '"'),
    ("–", "-"),
    ("—", "-"),
    ("…", "..."),
    ("\u00a0", " "),  # nbsp
)


def fold_typography_col(text: Column) -> Column:
    """Smart quotes / dashes / ellipsis / nbsp -> ASCII, a literal
    replace chain riding the scan (same shape as fold_ligatures_col)."""
    out = text
    for src, repl in TYPOGRAPHY_FOLDS:
        out = F.replace(out, F.lit(src), F.lit(repl))
    return out
