"""Readability-style content scoring (delta (a), SURVEY.md §7).

The reference deliberately REJECTS heuristic scoring in favor of exact
selectors (philosophy comment content-cleaner.ts:6-10; the [class*="dialog"]
Wikipedia regression is the cautionary tale). BASELINE.json's north star
nonetheless asks for link-density / text-density / tag-weight scoring, so it
exists here as:
  * an OPT-IN serialization mode (ExtractorConfig.readability_scoring) —
    never on for fixture-parity runs;
  * the last-resort arm of the C11 empty-content fallback.

Heuristics follow the published Readability/Arc90 family: per-container
score = text_length * (1 - link_density) * tag_weight, best container wins.
"""

from __future__ import annotations

from typing import Optional

from .htmlkit.dom import Node

# Containers eligible to be "the main content".
_CANDIDATE_TAGS = frozenset("article main section div td body".split())

_TAG_WEIGHT = {
    "article": 1.6,
    "main": 1.6,
    "section": 1.2,
    "div": 1.0,
    "td": 0.8,
    "body": 0.7,  # usable, but any real container should beat it
}

# Negative signals in class/id (classic Readability regex, simplified).
_NEGATIVE_HINTS = (
    "nav", "footer", "header", "sidebar", "comment", "menu", "share",
    "social", "ad-", "advert", "promo", "related", "widget", "cookie",
)
_POSITIVE_HINTS = ("article", "body", "content", "main", "post", "text", "entry")


def _text_lengths(node: Node) -> tuple[int, int]:
    """(total_text_len, link_text_len) for the subtree."""
    total = 0
    linked = 0
    stack: list[tuple[Node, bool]] = [(node, False)]
    while stack:
        current, in_link = stack.pop()
        if current.tag == "#text":
            n = len(current.text.strip())
            total += n
            if in_link:
                linked += n
            continue
        child_in_link = in_link or current.tag == "a"
        for child in current.children:
            stack.append((child, child_in_link))
    return total, linked


def _hint_factor(node: Node) -> float:
    blob = ((node.attrs.get("class") or "") + " " + (node.attrs.get("id") or "")).lower()
    factor = 1.0
    if any(h in blob for h in _NEGATIVE_HINTS):
        factor *= 0.25
    if any(h in blob for h in _POSITIVE_HINTS):
        factor *= 1.5
    return factor


def score_node(node: Node) -> float:
    """text_density x (1 - link_density) x tag_weight x class/id hints."""
    if node.tag not in _CANDIDATE_TAGS:
        return 0.0
    total, linked = _text_lengths(node)
    if total == 0:
        return 0.0
    link_density = linked / total
    return total * (1.0 - link_density) * _TAG_WEIGHT.get(node.tag, 0.5) * _hint_factor(node)


def select_main_content(document: Node, min_score: float = 25.0) -> Optional[Node]:
    """Best-scoring content container, or None when nothing scores.

    Prefers the DEEPEST node among score ties within 10% (an <article>
    inside a same-text <div> wrapper wins)."""
    best: Optional[Node] = None
    best_score = min_score
    for node in document.iter_elements():
        score = score_node(node)
        # Strictly-better wins; a descendant with >=90% of the ancestor's
        # score also wins (pre-order traversal visits ancestors first).
        if score > best_score:
            if best is not None and _is_descendant(node, best) and score >= 0.9 * best_score:
                best, best_score = node, max(score, best_score)
            else:
                best, best_score = node, score
        elif (
            best is not None
            and _is_descendant(node, best)
            and score >= 0.9 * best_score
        ):
            best = node
    return best


def _is_descendant(node: Node, ancestor: Node) -> bool:
    cur = node.parent
    while cur is not None:
        if cur is ancestor:
            return True
        cur = cur.parent
    return False
