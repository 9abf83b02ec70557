"""M2: markdown post-processing (reference: src/formatters/postprocess.ts:11-46).

Two forms:
  * ``postprocess_markdown`` — exact string-level port of the reference's four
    passes (the de-facto spec, pinned byte-exact by
    tests/unit/postprocess.test.ts).
  * ``postprocess_spans`` — the span-level equivalent applied in the engine so
    the spans array and the rendered markdown stay consistent.
"""

from __future__ import annotations

import re

from .serializer import Span

_SKIP_LINK_RE = re.compile(
    r"\[(?:Skip|Jump) to (?:main )?Content\]\(#[^)]*\)", re.IGNORECASE
)
_IMG_LINK_RE = re.compile(r"\[!\[([^\]]*)\]\(([^)]+)\)\]\(([^)]+)\)")
_BLANKS_RE = re.compile(r"\n{3,}")


def _dedupe_image_links(md: str) -> str:
    """Collapse [![alt](img)](url) -> ![alt](img) when img == url
    (first whitespace token compared, postprocess.ts:37-46)."""

    def repl(match: re.Match[str]) -> str:
        alt, img_url, link_url = match.group(1), match.group(2), match.group(3)
        if img_url.split()[0] == link_url.split()[0]:
            return f"![{alt}]({img_url})"
        return match.group(0)

    return _IMG_LINK_RE.sub(repl, md)


def postprocess_markdown(md: str) -> str:
    """The reference's four passes, in order (postprocess.ts:11-30)."""
    result = _SKIP_LINK_RE.sub("", md)
    result = _dedupe_image_links(result)
    result = _BLANKS_RE.sub("\n\n", result)
    return result.strip()


def postprocess_spans(spans: list[Span]) -> list[Span]:
    """Span-level M2: drop skip-links, dedupe image-links, drop emptied spans."""
    out: list[Span] = []
    for span in spans:
        text = _SKIP_LINK_RE.sub("", span.text)
        text = _dedupe_image_links(text)
        # Trim blank lines and trailing space but PRESERVE leading spaces —
        # they are nested-list indentation.
        text = _BLANKS_RE.sub("\n\n", text).strip("\n").rstrip()
        if not text.strip():
            continue
        kind = span.kind
        media_ref = span.media_ref
        if span.kind == "link" and text != span.text:
            # A link span whose text was rewritten is no longer a pure link.
            kind = "text"
            media_ref = None
        out.append(Span(kind, text, media_ref))
    return out
