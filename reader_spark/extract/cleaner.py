"""DOM cleaning pipeline C1-C8 (reference: src/utils/content-cleaner.ts:201-263).

Philosophy preserved from the reference (:6-10): strip only what is CERTAINLY
not content — exact selectors, no wildcards, no scoring — and let the
serializer be the real filter. Runs per-document inside a pandas UDF batch.

Performance: each removal pass is ONE tree walk against a compiled
SelectorSet (the reference walks the DOM once per selector — 40+ walks for
the nav list); C5-C8 and comment removal are fused into a single final walk.
Semantics are pass-for-pass identical; only the traversal count changes.
"""

from __future__ import annotations

import re
from functools import lru_cache

from ..config import (
    ALWAYS_REMOVE_SELECTORS,
    FORCE_INCLUDE_SELECTORS,
    ExtractorConfig,
)
from ..functions.urls import resolve_url
from ..htmlkit.dom import Node, parse_html
from ..htmlkit.selectors import SelectorSet, query_all

_BG_DATA_URL_RE = re.compile(
    r"background(-image)?:\s*url\([^)]*data:image[^)]*\)[^;]*;?", re.IGNORECASE
)

_ALWAYS_REMOVE_SET = SelectorSet(ALWAYS_REMOVE_SELECTORS)
_PROTECTED_SET = SelectorSet(FORCE_INCLUDE_SELECTORS)


@lru_cache(maxsize=64)
def _selector_set(selectors: tuple[str, ...]) -> SelectorSet:
    return SelectorSet(selectors)


def _is_attached(node: Node, document: Node) -> bool:
    cur = node
    while cur.parent is not None:
        cur = cur.parent
    return cur is document


def _remove_matching(document: Node, sset: SelectorSet) -> None:
    """removeElements — content-cleaner.ts:144-152 (no protection)."""
    for el in sset.query_all(document):
        el.remove()


def _remove_with_protection(document: Node, sset: SelectorSet) -> None:
    """removeWithProtection — content-cleaner.ts:158-192.

    Skip removal when the element IS a protected selector or CONTAINS one.
    Candidates already detached by an earlier removal are skipped (the
    reference never sees them: they left the live DOM).
    """
    for element in sset.query_all(document):
        if not _is_attached(element, document):
            continue
        if _PROTECTED_SET.matches(element):
            continue
        if _PROTECTED_SET.any_in_subtree(element):
            continue
        element.remove()


def _resolve_srcset_attr(el: Node) -> None:
    """C7 — resolveSrcsets, content-cleaner.ts:302-329: max_by(url, weight).

    Weights: ``Nw`` -> N, ``Nx`` -> N*100, bare -> treated as 1x.
    """
    srcset = el.attrs.get("srcset")
    if not srcset:
        return
    best_url, best_weight = None, float("-inf")
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
        if weight > best_weight:
            best_url, best_weight = url, weight
    if best_url is not None:
        el.attrs["src"] = best_url


def _final_pass(document: Node, base_url: str, remove_base64: bool) -> None:
    """Fused C5 (base64 images) + C6 (comments) + C7 (srcset) + C8
    (absolutify) in one walk. Per-node op order matches the reference's
    pass order: base64 filter, then srcset resolve, then absolutify."""
    to_remove: list[Node] = []
    stack = [document]
    while stack:
        node = stack.pop()
        children = node.children
        if children:
            stack.extend(reversed(children))
        tag = node.tag
        if tag[0] == "#":
            if tag == "#comment":
                to_remove.append(node)
            continue
        attrs = node.attrs
        if remove_base64:
            if tag == "img" and (attrs.get("src") or "").startswith("data:"):
                to_remove.append(node)
                continue
            if tag == "source" and (
                (attrs.get("src") or "").startswith("data:")
                or "data:" in (attrs.get("srcset") or "")
            ):
                to_remove.append(node)
                continue
            style = attrs.get("style")
            if style and "data:image" in style:
                cleaned = _BG_DATA_URL_RE.sub("", style)
                if cleaned.strip():
                    attrs["style"] = cleaned
                else:
                    attrs.pop("style", None)
        if tag == "img" and "srcset" in attrs:
            _resolve_srcset_attr(node)
        src = attrs.get("src")
        if src and not src.startswith(("http", "//", "data:")):
            attrs["src"] = resolve_url(src, base_url)
        href = attrs.get("href")
        if href and not href.startswith(
            ("http", "//", "#", "mailto:", "tel:", "javascript:")
        ):
            attrs["href"] = resolve_url(href, base_url)
    for node in to_remove:
        node.remove()


def clean_dom(document: Node, base_url: str, cfg: ExtractorConfig) -> Node:
    """cleanHtml steps 1-8 over an already-parsed document (mutates it)."""
    # C1: always-remove (content-cleaner.ts:207)
    _remove_matching(document, _ALWAYS_REMOVE_SET)

    # C2: user excludeTags (:209-212)
    if cfg.exclude_tags:
        _remove_matching(document, _selector_set(cfg.exclude_tags))

    # C3: navigation/boilerplate with protection (:215-220)
    if cfg.only_main_content:
        _remove_with_protection(document, _selector_set(cfg.nav_selectors()))

    # C4: includeTags whitelist (:223-241) — clones appended in selector order
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

    # C5-C8 fused single walk (:244-260)
    _final_pass(document, base_url, cfg.remove_base64_images)

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
