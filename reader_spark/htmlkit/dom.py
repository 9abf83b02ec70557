"""Lightweight, tolerant HTML DOM for per-document use inside Arrow batches.

Plays the role linkedom's ``parseHTML`` plays in the reference
(/root/reference/src/utils/content-cleaner.ts:1,204): a transient,
per-document mutable tree that is never a Spark type. Built on the stdlib
``html.parser.HTMLParser`` (tolerant of malformed markup, handles
script/style rawtext and entity decoding).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_BLOCK_TAGS = frozenset(
    "p div ul ol table h1 h2 h3 h4 h5 h6 pre blockquote section article "
    "header footer nav aside main form figure dl hr".split()
)

# Tags whose open instance is implicitly closed when `key` starts.
_IMPLIED_END: dict[str, frozenset[str]] = {
    "li": frozenset(["li"]),
    "dt": frozenset(["dt", "dd"]),
    "dd": frozenset(["dt", "dd"]),
    "tr": frozenset(["tr", "td", "th"]),
    "td": frozenset(["td", "th"]),
    "th": frozenset(["td", "th"]),
    "thead": frozenset(["tr", "td", "th"]),
    "tbody": frozenset(["thead", "tbody", "tr", "td", "th"]),
    "tfoot": frozenset(["tbody", "tr", "td", "th"]),
    "option": frozenset(["option"]),
}
for _b in _BLOCK_TAGS:
    _IMPLIED_END.setdefault(_b, frozenset())
    _IMPLIED_END[_b] = _IMPLIED_END[_b] | frozenset(["p"])


class Node:
    """One DOM node: element, text (#text), comment (#comment) or #document."""

    __slots__ = ("tag", "attrs", "children", "parent", "text")

    def __init__(
        self,
        tag: str,
        attrs: Optional[dict[str, str]] = None,
        text: str = "",
        parent: Optional["Node"] = None,
    ):
        self.tag = tag
        self.attrs = attrs if attrs is not None else {}
        self.children: list[Node] = []
        self.parent = parent
        self.text = text

    # -- structure ---------------------------------------------------------

    @property
    def is_element(self) -> bool:
        return not self.tag.startswith("#")

    def append_child(self, child: "Node") -> "Node":
        child.parent = self
        self.children.append(child)
        return child

    def remove(self) -> None:
        """Detach this node from its parent (Element.remove())."""
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def iter(self) -> Iterator["Node"]:
        """Pre-order traversal including self."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def iter_elements(self) -> Iterator["Node"]:
        for node in self.iter():
            if node.is_element:
                yield node

    def walk_elements(self) -> list["Node"]:
        """Pre-order list of element nodes. Same order as iter_elements but
        one function call total instead of a generator resume per node —
        the tree walk is the hottest loop in per-document extraction."""
        out: list[Node] = []
        stack = [self]
        while stack:
            node = stack.pop()
            children = node.children
            if children:
                stack.extend(reversed(children))
            if node.tag[0] != "#":
                out.append(node)
        return out

    def clone(self) -> "Node":
        copy = Node(self.tag, dict(self.attrs), self.text)
        for child in self.children:
            copy.append_child(child.clone())
        return copy

    # -- accessors ----------------------------------------------------------

    def get(self, name: str, default: Optional[str] = None) -> Optional[str]:
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def text_content(self) -> str:
        parts: list[str] = []
        stack = [self]
        while stack:
            node = stack.pop()
            if node.tag == "#text":
                parts.append(node.text)
            elif node.children:
                stack.extend(reversed(node.children))
        return "".join(parts)

    def find_first(self, tag: str) -> Optional["Node"]:
        for node in self.iter_elements():
            if node.tag == tag:
                return node
        return None

    # -- serialization -------------------------------------------------------

    def to_html(self) -> str:
        out: list[str] = []
        self._render(out)
        return "".join(out)

    def _render(self, out: list[str]) -> None:
        if self.tag == "#text":
            out.append(self.text)
            return
        if self.tag == "#comment":
            out.append(f"<!--{self.text}-->")
            return
        if self.tag == "#document":
            for child in self.children:
                child._render(out)
            return
        attrs = "".join(
            f' {k}' if v is None else f' {k}="{v}"' for k, v in self.attrs.items()
        )
        if self.tag in VOID_ELEMENTS:
            out.append(f"<{self.tag}{attrs}>")
            return
        out.append(f"<{self.tag}{attrs}>")
        for child in self.children:
            child._render(out)
        out.append(f"</{self.tag}>")

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.tag == "#text":
            return f"Text({self.text[:30]!r})"
        return f"<{self.tag} {self.attrs}>({len(self.children)} children)"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack: list[Node] = [self.root]

    # Implicit-end handling: close still-open tags the new tag terminates.
    def _implied_close(self, tag: str) -> None:
        closers = _IMPLIED_END.get(tag)
        if not closers:
            return
        while len(self.stack) > 1 and self.stack[-1].tag in closers:
            self.stack.pop()

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        tag = tag.lower()
        self._implied_close(tag)
        node = Node(tag, {k.lower(): (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append_child(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        tag = tag.lower()
        node = Node(tag, {k.lower(): (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append_child(node)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # Unmatched end tag: ignore (tolerant parse).

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].append_child(Node("#text", text=data))

    def handle_comment(self, data: str) -> None:
        self.stack[-1].append_child(Node("#comment", text=data))


def parse_html_stdlib(html: str) -> Node:
    """Stdlib html.parser-backed tree builder (the reference behavior pin)."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass  # keep whatever tree was built — tolerant like linkedom
    return builder.root


def parse_html(html: str) -> Node:
    """Parse an HTML string into a #document Node (never raises).

    Uses the fast regex tokenizer (htmlkit.fast_parser, ~2-3x quicker) and
    falls back to the stdlib builder on any internal error.
    """
    try:
        from .fast_parser import parse_html_fast

        return parse_html_fast(html)
    except Exception:
        return parse_html_stdlib(html)


def document_body(document: Node) -> Optional[Node]:
    body = document.find_first("body")
    if body is not None:
        return body
    # Fragment without <body>: treat the document itself as the body.
    return document


def document_element(document: Node) -> Optional[Node]:
    return document.find_first("html")
