"""Fast regex-driven HTML tokenizer -> Node tree.

Drop-in replacement for the stdlib-html.parser tree builder in dom.py
(~2-3x faster on article-sized documents; the parse is >half of per-document
extraction cost). Tolerant by construction: anything that does not scan as a
tag is text. Behavior pinned by the full dom/cleaner/serializer test suite;
``parse_html`` falls back to the stdlib builder if this one throws.

Tokenizer grammar (single compiled alternation, one linear scan):
  comments, <!declarations>, <?pi>, </end>, <start attrs...>, stray '<'.
Rawtext elements (script/style/textarea/title) capture everything up to
their case-insensitive close tag, like browsers and html.parser do.
"""

from __future__ import annotations

import re
from html import unescape

from .dom import _IMPLIED_END, VOID_ELEMENTS, Node

_TAG_RE = re.compile(
    r"""<(?:
        !--(?P<comment>.*?)--\s*>
      | !(?P<decl>[^>]*)>
      | \?(?P<pi>[^>]*)>
      | /(?P<end>[a-zA-Z][-\w:]*)[^>]*>
      | (?P<start>[a-zA-Z][-\w:]*)(?P<attrs>(?:"[^"]*"|'[^']*'|[^>"'])*)>
    )""",
    re.DOTALL | re.VERBOSE,
)

_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-.:\w]*)
        (?:\s*=\s*("([^"]*)"|'([^']*)'|[^\s>]*))?""",
    re.VERBOSE,
)

_RAWTEXT = {"script", "style", "textarea", "title"}
_RAWTEXT_CLOSE = {tag: re.compile(f"</{tag}", re.IGNORECASE) for tag in _RAWTEXT}

# Browsers cap DOM depth (WebKit ~512) and keep rendering; we cap at 256 so
# (a) a nesting bomb can't push the recursive serializer/renderer past
# Python's recursion limit — the document extracts instead of erroring —
# and (b) tree walks stay bounded. Elements past the cap are appended as
# children of the depth-cap node but never deepen the open-element stack,
# so all text is preserved (it accumulates flat at the cap).
MAX_TREE_DEPTH = 256


def _parse_attrs(raw: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        value = m.group(2)
        if value is None:
            value = ""
        elif value[:1] in ('"', "'"):
            value = m.group(3) if m.group(3) is not None else (m.group(4) or "")
        if value and "&" in value:
            value = unescape(value)
        if name not in attrs:
            attrs[name] = value
    return attrs


def parse_html_fast(html: str) -> Node:
    root = Node("#document")
    stack = [root]
    pos = 0
    n = len(html)
    append_text = Node  # local alias for speed

    while pos < n:
        lt = html.find("<", pos)
        if lt == -1:
            text = html[pos:]
            if text:
                if "&" in text:
                    text = unescape(text)
                stack[-1].append_child(append_text("#text", text=text))
            break
        if lt > pos:
            text = html[pos:lt]
            if "&" in text:
                text = unescape(text)
            stack[-1].append_child(append_text("#text", text=text))
        m = _TAG_RE.match(html, lt)
        if m is None:
            # Stray '<': treat as text (tolerant).
            stack[-1].append_child(append_text("#text", text="<"))
            pos = lt + 1
            continue
        pos = m.end()
        # lastgroup names the branch that matched (start tags end on the
        # always-participating "attrs" group) — one dict lookup instead
        # of probing each named group in turn.
        lg = m.lastgroup
        if lg == "attrs":
            tag = m.group("start").lower()
            raw_attrs = m.group("attrs")
            self_closing = raw_attrs.endswith("/")
            attrs = _parse_attrs(raw_attrs.rstrip("/")) if raw_attrs.strip("/ \t\r\n") else {}
            closers = _IMPLIED_END.get(tag)
            if closers:
                while len(stack) > 1 and stack[-1].tag in closers:
                    stack.pop()
            node = Node(tag, attrs)
            stack[-1].append_child(node)
            if tag in _RAWTEXT and not self_closing:
                close = _RAWTEXT_CLOSE[tag].search(html, pos)
                if close is None:
                    content, pos = html[pos:], n
                else:
                    content = html[pos : close.start()]
                    gt = html.find(">", close.end())
                    pos = n if gt == -1 else gt + 1
                if content:
                    if tag == "title" and "&" in content:
                        content = unescape(content)
                    node.append_child(append_text("#text", text=content))
            elif (
                tag not in VOID_ELEMENTS
                and not self_closing
                and len(stack) < MAX_TREE_DEPTH
            ):
                stack.append(node)
            continue
        if lg == "end":
            tag = m.group("end").lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        if lg == "comment":
            stack[-1].append_child(Node("#comment", text=m.group("comment")))
        # declarations / processing instructions are dropped
    return root


class StreamHeadIndex:
    """Metadata-relevant fields collected in ONE tokenizer scan with NO
    tree construction — duck-typed to metadata._HeadIndex (same attrs).

    Exists for the oversized-document path (pipeline.py C10): the ordering
    contract wants metadata from the FULL raw document, but building a
    full Node tree of a >2 MiB payload just to read <meta>/<link>/<title>/
    <html lang> doubles the giant's cost (the r2 regression). Token order
    equals tree walk_elements() preorder for these elements, so
    first-match-in-document-order semantics are preserved exactly.
    """

    __slots__ = ("by_name", "by_property", "charset", "http_equiv_content",
                 "links", "title_text", "html_lang")

    def __init__(self) -> None:
        self.by_name: dict[str, str] = {}
        self.by_property: dict[str, str] = {}
        self.charset = None
        self.http_equiv_content = None
        self.links: list[tuple[str, str]] = []
        self.title_text = None
        self.html_lang = None

    # reuse _HeadIndex's readers
    def meta(self, name):
        from ..extract.metadata import _HeadIndex

        return _HeadIndex.meta(self, name)

    def first_link(self, rel_exact=None, rel_contains=None):
        from ..extract.metadata import _HeadIndex

        return _HeadIndex.first_link(self, rel_exact, rel_contains)


def scan_head_index(html: str) -> StreamHeadIndex:
    """Single linear tokenizer pass collecting what _HeadIndex collects,
    skipping text nodes entirely and materializing zero Nodes."""
    idx = StreamHeadIndex()
    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt == -1:
            break
        m = _TAG_RE.match(html, lt)
        if m is None:
            pos = lt + 1
            continue
        pos = m.end()
        start = m.group("start")
        if start is None:
            continue
        tag = start.lower()
        if tag in _RAWTEXT:
            raw_attrs = m.group("attrs")
            self_closing = raw_attrs.endswith("/")
            if not self_closing:
                close = _RAWTEXT_CLOSE[tag].search(html, pos)
                if close is None:
                    content, pos = html[pos:], n
                else:
                    content = html[pos : close.start()]
                    gt = html.find(">", close.end())
                    pos = n if gt == -1 else gt + 1
                if tag == "title" and idx.title_text is None:
                    if content and "&" in content:
                        content = unescape(content)
                    idx.title_text = content
            elif tag == "title" and idx.title_text is None:
                idx.title_text = ""
            continue
        if tag == "meta":
            attrs = _parse_attrs(m.group("attrs").rstrip("/"))
            content = attrs.get("content")
            name = attrs.get("name")
            if name and content and name not in idx.by_name:
                idx.by_name[name] = content
            prop = attrs.get("property")
            if prop and content and prop not in idx.by_property:
                idx.by_property[prop] = content
            if idx.charset is None and attrs.get("charset"):
                idx.charset = attrs["charset"]
            if (
                idx.http_equiv_content is None
                and (attrs.get("http-equiv") or "").lower() == "content-type"
                and content
            ):
                idx.http_equiv_content = content
        elif tag == "link":
            attrs = _parse_attrs(m.group("attrs").rstrip("/"))
            rel = attrs.get("rel")
            href = attrs.get("href")
            if rel and href:
                idx.links.append((rel, href))
        elif tag == "html" and idx.html_lang is None:
            idx.html_lang = _parse_attrs(m.group("attrs").rstrip("/")).get("lang")
    return idx
