"""M1 string-level entry point (reference: htmlToMarkdown,
src/formatters/markdown.ts:20-46).

``html_to_markdown(html)`` converts an (already cleaned) HTML string to
markdown text. Falls back to regex tag-stripping (C12) when conversion
yields nothing for a substantial (>100 char) input, mirroring the
reference's Rust-converter fallback (markdown.ts:36-44).
"""

from __future__ import annotations

from ..functions.text import strip_tags
from ..htmlkit.dom import document_body, parse_html
from .serializer import render_markdown, serialize_spans

FALLBACK_MIN_INPUT_CHARS = 100


def html_to_markdown(html: str) -> str:
    if not html or not html.strip():
        return ""
    try:
        body = document_body(parse_html(html))
        markdown = render_markdown(serialize_spans(body)) if body is not None else ""
    except Exception:
        markdown = ""
    if not markdown and len(html) > FALLBACK_MIN_INPUT_CHARS:
        return strip_tags(html)
    return markdown


# Alias kept for API parity (markdown.ts:49: formatToMarkdown = htmlToMarkdown)
format_to_markdown = html_to_markdown
