"""The fused per-document extraction pipeline (reference: scrapeSingleUrl,
src/scraper.ts:125-385, steps 6-12) — the single Python-side function the
Spark ``mapInPandas`` stage loops per Arrow batch.

Order of operations preserved from the reference:
  C9  JSON short-circuit            scraper.ts:222,424-444
  X*  metadata on RAW html          scraper.ts:225 (before cleaning!)
  C1-C8 cleaning                    scraper.ts:228-237
  C10 2 MiB size guard              scraper.ts:242-256
  M1  serialize to spans/markdown   scraper.ts:258
  M2  postprocess                   scraper.ts:258
  C11 empty-content fallback        scraper.ts:260-278
  C12 tag-strip fallback            formatters/markdown.ts:53-60
  T5  typed errors become columns   src/errors.ts:484 (rows, not exceptions)
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

from ..config import (
    EMPTY_MD_FALLBACK_MD_CHARS,
    EMPTY_MD_FALLBACK_RAW_CHARS,
    DEFAULT_CONFIG,
    ExtractorConfig,
)
from ..functions.text import detect_bot_page, strip_tags
from ..htmlkit.dom import document_body, parse_html
from .cleaner import clean_dom
from .metadata import extract_metadata_dom, extract_metadata_stream
from .postprocess import postprocess_spans
from .serializer import Span, render_markdown, serialize_spans


@dataclasses.dataclass
class ExtractResult:
    doc_id: str
    spans: list[Span]
    markdown: str
    metadata: Optional[dict[str, Any]]
    error_kind: Optional[str] = None
    error_msg: Optional[str] = None
    html: Optional[str] = None  # cleaned HTML, only when 'html' in formats

    @property
    def ok(self) -> bool:
        return self.error_kind is None


def detect_json_payload(payload: str, cap: int) -> Optional[str]:
    """C9 — detectJsonPayload (scraper.ts:424-444): 2xx body that parses as a
    JSON object/array under the cap bypasses cleaning; returns pretty JSON."""
    trimmed = payload.strip()
    if not trimmed or len(trimmed) > cap:
        return None
    first, last = trimmed[0], trimmed[-1]
    if not ((first == "{" and last == "}") or (first == "[" and last == "]")):
        return None
    try:
        parsed = json.loads(trimmed)
    except (json.JSONDecodeError, ValueError):
        return None
    if not isinstance(parsed, (dict, list)):
        return None
    return json.dumps(parsed, indent=2, ensure_ascii=False)


def _serialize_payload(
    payload: str,
    base_url: str,
    cfg: ExtractorConfig,
    document=None,
):
    """Clean + serialize. Returns (spans, cleaned_document)."""
    if document is None:
        document = parse_html(payload)
    clean_dom(document, base_url, cfg)
    root = document_body(document)
    if cfg.readability_scoring and root is not None:
        # Opt-in scoring mode (delta (a)): serialize from the best-scoring
        # container instead of the whole body.
        from ..readability import select_main_content

        root = select_main_content(document) or root
    spans = serialize_spans(root) if root is not None else []
    return postprocess_spans(spans), document


def _cleaned_html(document) -> str:
    """M3 HTML formatter — identity passthrough of the cleaned document
    (formatters/html.ts:15-17)."""
    html_el = document.find_first("html")
    return html_el.to_html() if html_el is not None else document.to_html()


def extract_document(
    doc_id: str,
    payload: str,
    base_url: str,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    payload_kind: str = "html",
) -> ExtractResult:
    """Extract one document. Never raises — errors become columns (T5).

    payload_kind 'pdf_text' routes to the PDF layout parser (positioned
    text boxes -> column detection -> XY-cut reading order); everything
    else goes through the HTML/JSON pipeline.
    """
    try:
        if payload_kind == "pdf_text":
            return _extract_pdf(doc_id, payload)
        return _extract(doc_id, payload, base_url, cfg)
    except Exception as exc:  # wrapError analogue, errors.ts:484
        return ExtractResult(
            doc_id=doc_id,
            spans=[],
            markdown="",
            metadata=None,
            error_kind=type(exc).__name__,
            error_msg=str(exc)[:500],
        )


def _extract_pdf(doc_id: str, payload: str) -> ExtractResult:
    from ..pdf.layout import extract_pdf_spans

    if payload is None or not payload.strip():
        return ExtractResult(
            doc_id=doc_id,
            spans=[],
            markdown="",
            metadata=None,
            error_kind="EmptyDocumentError",
            error_msg="document payload is empty",
        )
    spans = extract_pdf_spans(payload)
    return ExtractResult(
        doc_id=doc_id,
        spans=spans,
        markdown=render_markdown(spans),
        metadata=None,
    )


def _extract(
    doc_id: str, payload: str, base_url: str, cfg: ExtractorConfig
) -> ExtractResult:
    if payload is None or not payload.strip():
        # cleanContent throws on empty input (content-cleaner.test.ts:189-196);
        # at the dataset level that is an error row, not a crash.
        return ExtractResult(
            doc_id=doc_id,
            spans=[],
            markdown="",
            metadata=None,
            error_kind="EmptyDocumentError",
            error_msg="document payload is empty",
        )

    # U10 — content-based block detection (only when configured).
    if cfg.block_patterns and detect_bot_page(
        payload,
        cfg.block_patterns,
        cfg.short_content_threshold,
        cfg.long_content_signal_threshold,
    ):
        return ExtractResult(
            doc_id=doc_id,
            spans=[],
            markdown="",
            metadata=None,
            error_kind="BlockedPageError",
            error_msg="bot_page_detected",
        )

    # C9 — JSON short-circuit (before metadata/cleaning, scraper.ts:222).
    pretty = detect_json_payload(payload, cfg.json_detection_cap)
    if pretty is not None:
        text = f"```json\n{pretty}\n```"
        return ExtractResult(
            doc_id=doc_id,
            spans=[Span("json", text)],
            markdown=text,
            metadata=None,
        )

    # Ordering contract (scraper.ts:225, 242-256): metadata comes from the
    # FULL raw document; the C10 size guard truncates only before
    # conversion. Oversized documents run the STREAMING metadata scan over
    # the full payload (no tree build — a full-tree parse of a multi-MiB
    # giant existed only to feed the metadata battery and doubled giant
    # cost), then parse only the truncated payload once for content. The
    # contract holds: a <title> or meta tag past the cap still reaches the
    # metadata columns.
    if len(payload) > cfg.max_html_size:
        metadata = extract_metadata_stream(payload, base_url)
        payload = payload[: cfg.max_html_size]  # C10
        raw_document = parse_html(payload)
    else:
        # X1-X11 — metadata from the RAW document, before cleaning mutates
        # it; the common path parses exactly once (metadata + cleaning
        # share the tree).
        raw_document = parse_html(payload)
        metadata = extract_metadata_dom(raw_document, base_url)

    spans, cleaned_doc = _serialize_payload(
        payload, base_url, cfg, document=raw_document
    )
    markdown = render_markdown(spans)

    # C11 — empty-main-content fallback (scraper.ts:260-278): re-clean with
    # onlyMainContent=False when the main-only result is (near) empty.
    if (
        cfg.only_main_content
        and len(markdown) < EMPTY_MD_FALLBACK_MD_CHARS
        and len(payload) > EMPTY_MD_FALLBACK_RAW_CHARS
    ):
        relaxed = dataclasses.replace(cfg, only_main_content=False)
        spans, cleaned_doc = _serialize_payload(payload, base_url, relaxed)
        markdown = render_markdown(spans)
        if len(markdown) < EMPTY_MD_FALLBACK_MD_CHARS:
            # Last-resort arm of C11 (delta (a)): readability scoring picks
            # the densest content container from the relaxed-clean document.
            scored = dataclasses.replace(
                cfg, only_main_content=False, readability_scoring=True
            )
            scored_spans, scored_doc = _serialize_payload(payload, base_url, scored)
            scored_markdown = render_markdown(scored_spans)
            if len(scored_markdown) > len(markdown):
                spans, markdown, cleaned_doc = (
                    scored_spans,
                    scored_markdown,
                    scored_doc,
                )

    # C12 — tag-strip fallback when serialization produced nothing from a
    # substantial document (formatters/markdown.ts:36-44: >100 chars in,
    # empty out => regex strip).
    if not markdown and len(payload) > 100:
        fallback_text = strip_tags(payload)
        if fallback_text:
            spans = [Span("text", fallback_text)]
            markdown = fallback_text

    return ExtractResult(
        doc_id=doc_id,
        spans=spans,
        markdown=markdown,
        metadata=metadata,
        html=_cleaned_html(cleaned_doc) if "html" in cfg.formats else None,
    )
