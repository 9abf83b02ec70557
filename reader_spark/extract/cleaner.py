"""DOM cleaning pipeline C1-C8 (reference: src/utils/content-cleaner.ts:201-263).

Philosophy preserved from the reference (:6-10): strip only what is CERTAINLY
not content — exact selectors, no wildcards, no scoring — and let the
serializer be the real filter. Runs per-document inside a pandas UDF batch.
"""

from __future__ import annotations

import re

from ..config import (
    ALWAYS_REMOVE_SELECTORS,
    FORCE_INCLUDE_SELECTORS,
    ExtractorConfig,
)
from ..functions.urls import resolve_url
from ..htmlkit.dom import Node, parse_html
from ..htmlkit.selectors import matches, query_all

_BG_DATA_URL_RE = re.compile(
    r"background(-image)?:\s*url\([^)]*data:image[^)]*\)[^;]*;?", re.IGNORECASE
)


def _remove_elements(document: Node, selectors: tuple[str, ...]) -> None:
    """removeElements — content-cleaner.ts:144-152 (bad selectors skipped)."""
    for selector in selectors:
        try:
            for el in list(query_all(document, selector)):
                el.remove()
        except ValueError:
            continue


def _remove_with_protection(
    document: Node,
    selectors_to_remove: tuple[str, ...],
    protected_selectors: tuple[str, ...],
) -> None:
    """removeWithProtection — content-cleaner.ts:158-192.

    Skip removal when the element IS a protected selector or CONTAINS one.
    """
    for selector in selectors_to_remove:
        try:
            candidates = list(query_all(document, selector))
        except ValueError:
            continue
        for element in candidates:
            if element.parent is None:
                continue  # already removed by an earlier selector
            protected = False
            for ps in protected_selectors:
                try:
                    if matches(element, ps):
                        protected = True
                        break
                except ValueError:
                    continue
            if not protected:
                for ps in protected_selectors:
                    try:
                        if next(query_all(element, ps), None) is not None:
                            protected = True
                            break
                    except ValueError:
                        continue
            if not protected:
                element.remove()


def _remove_base64_images(document: Node) -> None:
    """C5 — removeBase64ImagesFromDocument, content-cleaner.ts:272-297."""
    for el in list(query_all(document, "img[src^='data:']")):
        el.remove()
    for el in list(query_all(document, "[style*='data:image']")):
        style = el.attrs.get("style")
        if style:
            cleaned = _BG_DATA_URL_RE.sub("", style)
            if cleaned.strip():
                el.attrs["style"] = cleaned
            else:
                el.attrs.pop("style", None)
    for el in list(query_all(document, "source[src^='data:']")):
        el.remove()
    for el in list(query_all(document, "source[srcset*='data:']")):
        el.remove()


def _remove_comments(document: Node) -> None:
    """C6 — TreeWalker comment removal, content-cleaner.ts:249-254."""
    for node in list(document.iter()):
        if node.tag == "#comment":
            node.remove()


def _resolve_srcsets(document: Node) -> None:
    """C7 — resolveSrcsets, content-cleaner.ts:302-329: max_by(url, weight).

    Weights: ``Nw`` -> N, ``Nx`` -> N*100, bare -> treated as 1x.
    """
    for el in query_all(document, "img[srcset]"):
        srcset = el.attrs.get("srcset")
        if not srcset:
            continue
        candidates: list[tuple[str, float]] = []
        for entry in srcset.split(","):
            parts = entry.strip().split()
            if not parts:
                continue
            url = parts[0]
            descriptor = parts[1] if len(parts) > 1 else "1x"
            weight = 0.0
            if descriptor.endswith("w"):
                try:
                    weight = int(descriptor[:-1])
                except ValueError:
                    weight = 0.0
            elif descriptor.endswith("x"):
                try:
                    weight = float(descriptor[:-1]) * 100
                except ValueError:
                    weight = 100.0
            candidates.append((url, weight))
        if candidates:
            best = max(candidates, key=lambda c: c[1])
            el.attrs["src"] = best[0]


def _convert_relative_urls(document: Node, base_url: str) -> None:
    """C8 — convertRelativeUrls, content-cleaner.ts:334-364."""
    for el in query_all(document, "[src]"):
        src = el.attrs.get("src")
        if src and not src.startswith(("http", "//", "data:")):
            el.attrs["src"] = resolve_url(src, base_url)
    for el in query_all(document, "[href]"):
        href = el.attrs.get("href")
        if href and not href.startswith(
            ("http", "//", "#", "mailto:", "tel:", "javascript:")
        ):
            el.attrs["href"] = resolve_url(href, base_url)


def clean_dom(document: Node, base_url: str, cfg: ExtractorConfig) -> Node:
    """cleanHtml steps 1-8 over an already-parsed document (mutates it)."""
    # C1: always-remove (content-cleaner.ts:207)
    _remove_elements(document, ALWAYS_REMOVE_SELECTORS)

    # C2: user excludeTags (:209-212)
    if cfg.exclude_tags:
        _remove_elements(document, cfg.exclude_tags)

    # C3: navigation/boilerplate with protection (:215-220)
    if cfg.only_main_content:
        _remove_with_protection(document, cfg.nav_selectors(), FORCE_INCLUDE_SELECTORS)

    # C4: includeTags whitelist (:223-241)
    if cfg.include_tags:
        matched: list[Node] = []
        for selector in cfg.include_tags:
            try:
                for el in query_all(document, selector):
                    matched.append(el.clone())
            except ValueError:
                continue
        if matched:
            body = document.find_first("body")
            if body is None:
                # Fragment: synthesize a body to host the whitelist.
                body = Node("body")
                document.children = []
                document.append_child(body)
            body.children = []
            for el in matched:
                body.append_child(el)

    # C5: base64 images (:244-246)
    if cfg.remove_base64_images:
        _remove_base64_images(document)

    # C6: comments (:249-254)
    _remove_comments(document)

    # C7: srcset top-1 (:257)
    _resolve_srcsets(document)

    # C8: absolutify (:260)
    _convert_relative_urls(document, base_url)

    return document


def clean_html(html: str, base_url: str, cfg: ExtractorConfig) -> str:
    """cleanContent — string-in/string-out form (content-cleaner.ts:369-371).

    Raises ValueError on empty/whitespace input, matching the reference's
    throw (tests/unit/content-cleaner.test.ts:189-196).
    """
    if not html or not html.strip():
        raise ValueError("cannot clean empty HTML")
    document = clean_dom(parse_html(html), base_url, cfg)
    html_el = document.find_first("html")
    return html_el.to_html() if html_el is not None else document.to_html()
