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
        if not node.is_element:
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
    for node in root.iter_elements():
        if node is root:
            continue
        if any(c.matches(node) for c in compounds):
            yield node


def query_first(root: Node, selector: str) -> Optional[Node]:
    for node in query_all(root, selector):
        return node
    return None
