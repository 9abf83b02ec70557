"""M1: cleaned DOM -> ordered (kind, text, media_ref, order) spans + markdown.

The serialization contract is the reference converter's options + test
assertions (src/formatters/markdown.ts:22-27;
tests/unit/markdown-formatter.test.ts): ATX headings, '-' bullets, inline
links ``[text](href)``, ``**bold**``/``*italic*``, backtick code fences, GFM
pipe tables, ``![alt](src)`` images. The document markdown is the
'\\n\\n'-join of span texts, so both representations agree by construction.

Span kinds: heading | text | list_item | code | table | image | link | json.
Media spans (image, link, linked image) carry ``media_ref``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Union

from ..htmlkit.dom import Node

_WS_RE = re.compile(r"\s+")

_HEADING_TAGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

_BLOCK_TAGS = frozenset(
    "p div ul ol table pre blockquote section article main body header footer "
    "nav aside figure figcaption form fieldset details summary dl dt dd hr "
    "h1 h2 h3 h4 h5 h6".split()
)

_SKIP_TAGS = frozenset(
    "script style noscript meta head title link template iframe svg "
    "button select option textarea".split()
)


@dataclass
class Span:
    kind: str
    text: str
    media_ref: Optional[str] = None


# Inline segment markers produced by _inline_segments
_Image = tuple  # ("img", alt, src)
_Link = tuple  # ("link", inner_md, href)
_LinkedImage = tuple  # ("limg", alt, img_src, href)


# Any whitespace that is not a plain single space (incl. unicode spaces,
# which \s matches), or a double space: exactly the inputs where the \s+
# collapse is not the identity.
_WS_DIRTY_RE = re.compile(r"[^\S ]|  ")


def _collapse_ws(text: str) -> str:
    # search-then-sub: most text nodes are already collapsed, and a search
    # with no match is far cheaper than a sub that rebuilds the string.
    if _WS_DIRTY_RE.search(text) is None:
        return text
    return _WS_RE.sub(" ", text)


def _inline_segments(node: Node, out: list[Union[str, tuple]]) -> None:
    """Render inline content into text pieces and media markers."""
    if node.tag == "#text":
        out.append(_collapse_ws(node.text))
        return
    if node.tag == "#comment" or node.tag in _SKIP_TAGS:
        return
    tag = node.tag
    if tag == "br":
        out.append("\n")
        return
    if tag == "img":
        src = node.attrs.get("src", "")
        alt = _collapse_ws(node.attrs.get("alt", "")).strip()
        if src:
            out.append(("img", alt, src))
        return
    if tag == "a":
        href = node.attrs.get("href", "")
        inner: list[Union[str, tuple]] = []
        for child in node.children:
            _inline_segments(child, inner)
        imgs = [seg for seg in inner if isinstance(seg, tuple) and seg[0] == "img"]
        texts = "".join(seg for seg in inner if isinstance(seg, str)).strip()
        if href and len(imgs) == 1 and not texts:
            _, alt, src = imgs[0]
            out.append(("limg", alt, src, href))
            return
        inner_md = _render_segments_inline(inner).strip()
        if href:
            if inner_md == href:
                # GFM autolink (README.md:667-672 extras).
                out.append(f"<{href}>")
            else:
                out.append(("link", inner_md, href))
        else:
            out.append(inner_md)
        return
    if tag in ("strong", "b"):
        inner_md = _render_children_inline(node).strip()
        out.append(f"**{inner_md}**" if inner_md else "")
        return
    if tag in ("em", "i"):
        inner_md = _render_children_inline(node).strip()
        out.append(f"*{inner_md}*" if inner_md else "")
        return
    if tag in ("del", "s", "strike"):
        inner_md = _render_children_inline(node).strip()
        out.append(f"~~{inner_md}~~" if inner_md else "")
        return
    if tag == "code":
        content = node.text_content().strip()
        out.append(f"`{content}`" if content else "")
        return
    # Transparent inline containers (span, small, sup, label, ...) and any
    # unknown tag: recurse.
    for child in node.children:
        _inline_segments(child, out)


def _render_children_inline(node: Node) -> str:
    segs: list[Union[str, tuple]] = []
    for child in node.children:
        _inline_segments(child, segs)
    return _render_segments_inline(segs)


def _render_segments_inline(segs: list[Union[str, tuple]]) -> str:
    """Flatten segments to inline markdown (media rendered inline)."""
    parts: list[str] = []
    for seg in segs:
        if isinstance(seg, str):
            parts.append(seg)
        elif seg[0] == "img":
            parts.append(f"![{seg[1]}]({seg[2]})")
        elif seg[0] == "limg":
            _, alt, src, href = seg
            src_base = src.split()[0] if src.split() else ""
            href_base = href.split()[0] if href.split() else ""
            if src_base and src_base == href_base:
                parts.append(f"![{alt}]({src})")
            else:
                parts.append(f"[![{alt}]({src})]({href})")
        elif seg[0] == "link":
            parts.append(f"[{seg[1]}]({seg[2]})")
    return _collapse_ws("".join(parts))


class _Serializer:
    def __init__(self) -> None:
        self.spans: list[Span] = []
        self._buf: list[Union[str, tuple]] = []

    # -- flow handling -------------------------------------------------------

    def _flush(self) -> None:
        """Emit buffered inline content as text/image/link spans."""
        segs = self._buf
        self._buf = []
        if not segs:
            return
        # Standalone-link rule: a flow run that is exactly one link (modulo
        # whitespace) becomes a `link` span; otherwise links stay inline.
        non_ws = [
            seg
            for seg in segs
            if not (isinstance(seg, str) and not seg.strip())
        ]
        if len(non_ws) == 1 and isinstance(non_ws[0], tuple):
            seg = non_ws[0]
            if seg[0] == "link":
                self.spans.append(
                    Span("link", f"[{seg[1]}]({seg[2]})", seg[2])
                )
                return
            if seg[0] == "img":
                self.spans.append(Span("image", f"![{seg[1]}]({seg[2]})", seg[2]))
                return
            if seg[0] == "limg":
                self._emit_linked_image(seg)
                return
        text_acc: list[str] = []

        def flush_text() -> None:
            text = _collapse_ws("".join(text_acc)).strip()
            text_acc.clear()
            if text:
                self.spans.append(Span("text", text))

        for seg in segs:
            if isinstance(seg, str):
                text_acc.append(seg)
            elif seg[0] == "img":
                flush_text()
                self.spans.append(Span("image", f"![{seg[1]}]({seg[2]})", seg[2]))
            elif seg[0] == "limg":
                flush_text()
                self._emit_linked_image(seg)
            elif seg[0] == "link":
                text_acc.append(f"[{seg[1]}]({seg[2]})")
        flush_text()

    def _emit_linked_image(self, seg: tuple) -> None:
        """[![alt](img)](url): collapse to image when img == url (M2 pass 2,
        postprocess.ts:37-46 — compare first whitespace token)."""
        _, alt, src, href = seg
        src_base = src.split()[0] if src.split() else ""
        href_base = href.split()[0] if href.split() else ""
        if src_base == href_base:
            self.spans.append(Span("image", f"![{alt}]({src})", src))
        else:
            self.spans.append(
                Span("image", f"[![{alt}]({src})]({href})", src)
            )

    # -- block handling --------------------------------------------------------

    def walk_flow(self, node: Node) -> None:
        """Walk children of a flow container, splitting inline runs on blocks."""
        for child in node.children:
            if child.tag in _SKIP_TAGS or child.tag == "#comment":
                continue
            if child.tag in _BLOCK_TAGS:  # "#..." tags are never block tags
                self._flush()
                self.block(child)
            else:
                _inline_segments(child, self._buf)
        self._flush()

    def block(self, node: Node) -> None:
        tag = node.tag
        if tag in _HEADING_TAGS:
            text = _render_children_inline(node).strip()
            if text:
                self.spans.append(Span("heading", "#" * _HEADING_TAGS[tag] + " " + text))
            return
        if tag == "p":
            segs: list[Union[str, tuple]] = []
            for child in node.children:
                _inline_segments(child, segs)
            self._buf = segs
            self._flush()
            return
        if tag in ("ul", "ol"):
            self._list(node, depth=0)
            return
        if tag == "pre":
            content = node.text_content().strip("\n")
            if content.strip():
                self.spans.append(Span("code", f"```\n{content}\n```"))
            return
        if tag == "table":
            self._table(node)
            return
        if tag == "blockquote":
            text = _render_children_inline(node).strip()
            if text:
                quoted = "\n".join("> " + line for line in text.split("\n"))
                self.spans.append(Span("text", quoted))
            return
        if tag == "hr":
            self.spans.append(Span("text", "---"))
            return
        if tag in ("dt", "dd", "figcaption", "summary"):
            text = _render_children_inline(node).strip()
            if text:
                self.spans.append(Span("text", text))
            return
        # Generic flow containers: div, section, article, main, body, ...
        self.walk_flow(node)

    def _list(self, node: Node, depth: int) -> None:
        ordered = node.tag == "ol"
        index = 0
        for child in node.children:
            if child.tag != "li":  # includes all "#..." nodes
                continue
            index += 1
            marker = f"{index}. " if ordered else "- "
            nested = [
                grand
                for grand in child.children
                if grand.tag in ("ul", "ol")
            ]
            segs: list[Union[str, tuple]] = []
            task_box = ""
            for grand in child.children:
                if grand.tag in ("ul", "ol"):
                    continue
                # GFM task lists (README.md:667-672 extras).
                if grand.tag == "input" and (
                    grand.attrs.get("type") == "checkbox"
                ):
                    task_box = "[x] " if "checked" in grand.attrs else "[ ] "
                    continue
                _inline_segments(grand, segs)
            text = _render_segments_inline(segs).strip()
            if text:
                self.spans.append(
                    Span("list_item", "  " * depth + marker + task_box + text)
                )
            for sub in nested:
                self._list(sub, depth + 1)

    def _table(self, node: Node) -> None:
        rows: list[list[str]] = []
        for tr in node.iter_elements():
            if tr.tag != "tr":
                continue
            cells = [
                _render_children_inline(cell).strip().replace("|", "\\|").replace("\n", " ")
                for cell in tr.children
                if cell.tag in ("td", "th")
            ]
            if cells:
                rows.append(cells)
        if not rows:
            return
        width = max(len(r) for r in rows)
        for r in rows:
            r.extend([""] * (width - len(r)))
        lines = ["| " + " | ".join(rows[0]) + " |"]
        lines.append("| " + " | ".join(["---"] * width) + " |")
        for r in rows[1:]:
            lines.append("| " + " | ".join(r) + " |")
        self.spans.append(Span("table", "\n".join(lines)))


def serialize_spans(body: Node) -> list[Span]:
    """Serialize a cleaned body/fragment into ordered spans."""
    ser = _Serializer()
    ser.walk_flow(body)
    return ser.spans


def render_markdown(spans: list[Span]) -> str:
    """Document markdown = blank-line-joined span texts (M2 passes 3-4 are
    structural here: one blank line between spans, trimmed ends)."""
    return "\n\n".join(span.text for span in spans if span.text).strip()
