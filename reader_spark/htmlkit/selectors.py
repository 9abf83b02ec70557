"""CSS selector subset: exactly the grammar the reference's selector lists use.

Covers tag, ``.class``, ``#id``, ``[attr]``, ``[attr='v']``, ``[attr^='v']``,
``[attr*='v']`` and compounds thereof (e.g. ``img[src^='data:']``,
``link[rel*='icon']``, ``[role='main']``), plus comma-separated groups.
No combinators — the reference never uses them in its removal lists
(/root/reference/src/utils/content-cleaner.ts:43-135).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterator, Optional

from .dom import Node

_PART_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*)
  | \#(?P<id>[\w-]+)
  | \.(?P<cls>[\w-]+)
  | \[(?P<attr>[\w-]+)
      (?:(?P<op>[\^\*\$]?=)
         (?P<q>['"]?)(?P<val>[^\]'"]*)(?P=q))?
    \]
    """,
    re.VERBOSE,
)


class SimpleSelector:
    __slots__ = ("tag", "sel_id", "classes", "attr_tests")

    def __init__(self) -> None:
        self.tag: Optional[str] = None
        self.sel_id: Optional[str] = None
        self.classes: list[str] = []
        # (attr, op, value); op in {None, '=', '^=', '*=', '$='}
        self.attr_tests: list[tuple[str, Optional[str], Optional[str]]] = []

    def matches(self, node: Node) -> bool:
        if node.tag[0] == "#":  # non-element (cheaper than the property)
            return False
        if self.tag is not None and node.tag != self.tag:
            return False
        if self.sel_id is not None and node.attrs.get("id") != self.sel_id:
            return False
        if self.classes:
            node_classes = node.classes
            for cls in self.classes:
                if cls not in node_classes:
                    return False
        for attr, op, val in self.attr_tests:
            actual = node.attrs.get(attr)
            if actual is None:
                return False
            if op is None:
                continue
            if op == "=" and actual != val:
                return False
            if op == "^=" and not actual.startswith(val or ""):
                return False
            if op == "*=" and (val or "") not in actual:
                return False
            if op == "$=" and not actual.endswith(val or ""):
                return False
        return True


@lru_cache(maxsize=1024)
def parse_selector(selector: str) -> tuple[SimpleSelector, ...]:
    """Parse a selector group into compound simple selectors.

    Raises ValueError on anything outside the supported grammar (mirrors
    the reference's try/catch-skip around unsupported selectors,
    content-cleaner.ts:146-151).
    """
    compounds: list[SimpleSelector] = []
    for part in selector.split(","):
        part = part.strip()
        if not part:
            raise ValueError(f"empty selector in {selector!r}")
        # Combinators/pseudo-classes are unsupported — but colons and spaces
        # inside [attr='...'] values are fine, so check outside brackets only.
        outside_brackets = re.sub(r"\[[^\]]*\]", "", part)
        if re.search(r"[\s>+~:]", outside_brackets):
            raise ValueError(f"unsupported selector: {part!r}")
        compound = SimpleSelector()
        pos = 0
        while pos < len(part):
            m = _PART_RE.match(part, pos)
            if m is None:
                raise ValueError(f"unsupported selector: {part!r}")
            if m.group("tag"):
                compound.tag = m.group("tag").lower()
            elif m.group("id"):
                compound.sel_id = m.group("id")
            elif m.group("cls"):
                compound.classes.append(m.group("cls"))
            elif m.group("attr"):
                compound.attr_tests.append(
                    (m.group("attr").lower(), m.group("op"), m.group("val"))
                )
            pos = m.end()
        compounds.append(compound)
    return tuple(compounds)


def matches(node: Node, selector: str) -> bool:
    """Element.matches(selector) — raises ValueError for unsupported grammar."""
    return any(c.matches(node) for c in parse_selector(selector))


def query_all(root: Node, selector: str) -> Iterator[Node]:
    """document.querySelectorAll in document order (pre-order DFS)."""
    compounds = parse_selector(selector)
    for node in root.walk_elements():
        if node is root:
            continue
        if any(c.matches(node) for c in compounds):
            yield node


def query_first(root: Node, selector: str) -> Optional[Node]:
    for node in query_all(root, selector):
        return node
    return None


class SelectorSet:
    """A compiled group of simple selectors matched in ONE tree walk.

    Plain-tag / single-class / single-id selectors (the overwhelming
    majority of the reference's lists) hit set-membership fast paths; the
    rest fall back to compound matching. Unsupported selectors are skipped
    (same try/catch-skip as the reference).
    """

    __slots__ = ("tags", "ids", "classes", "general")

    def __init__(self, selectors: tuple[str, ...] | list[str]):
        self.tags: set[str] = set()
        self.ids: set[str] = set()
        self.classes: set[str] = set()
        self.general: list[SimpleSelector] = []
        for selector in selectors:
            try:
                compounds = parse_selector(selector)
            except ValueError:
                continue
            for c in compounds:
                if c.tag and not c.sel_id and not c.classes and not c.attr_tests:
                    self.tags.add(c.tag)
                elif c.sel_id and not c.tag and not c.classes and not c.attr_tests:
                    self.ids.add(c.sel_id)
                elif (
                    len(c.classes) == 1
                    and not c.tag
                    and not c.sel_id
                    and not c.attr_tests
                ):
                    self.classes.add(c.classes[0])
                else:
                    self.general.append(c)

    def matches(self, node: Node) -> bool:
        if node.tag[0] == "#":  # non-element (cheaper than the property)
            return False
        if node.tag in self.tags:
            return True
        attrs = node.attrs
        if self.ids and attrs.get("id") in self.ids:
            return True
        if self.classes and attrs.get("class"):
            for cls in node.classes:
                if cls in self.classes:
                    return True
        for c in self.general:
            if c.matches(node):
                return True
        return False

    def query_all(self, root: Node) -> list[Node]:
        matches = self.matches
        return [
            node
            for node in root.walk_elements()
            if node is not root and matches(node)
        ]

    def any_in_subtree(self, root: Node) -> bool:
        matches = self.matches
        for node in root.walk_elements():
            if node is not root and matches(node):
                return True
        return False
