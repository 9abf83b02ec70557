"""PDF layout parser: column detection + reading-order sort (delta (b),
SURVEY.md §7 — the reference SKIPS PDFs, url-helpers.ts:281,320; built here
from published heuristics instead: recursive XY-cut reading order
(Nagy & Seth, ICPR'84 family of page-segmentation algorithms) with
x-gutter-based column splits).

Input: a ``kind='pdf_text'`` payload of positioned text boxes, one per line:
    page\tx0\ty0\tx1\ty1\ttext          (y grows downward)

Output: ordered spans (heading/text) in natural reading order — full-width
elements first at their y-position, then column-by-column left to right.
Pure Python; runs inside the same fused Arrow-batch UDF as the HTML path.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..extract.serializer import Span


@dataclass(frozen=True)
class Box:
    page: int
    x0: float
    y0: float
    x1: float
    y1: float
    text: str


def parse_boxes(payload: str) -> list[Box]:
    boxes = []
    for line in payload.splitlines():
        if not line.strip():
            continue
        parts = line.split("\t", 5)
        if len(parts) != 6:
            raise ValueError(f"malformed pdf_text line: {line[:80]!r}")
        page, x0, y0, x1, y1, text = parts
        boxes.append(
            Box(int(page), float(x0), float(y0), float(x1), float(y1), text)
        )
    return boxes


def _largest_gap(intervals: list[tuple[float, float]]) -> tuple[float, float]:
    """Largest uncovered gap inside the union of [start, end) intervals.
    Returns (gap_size, gap_midpoint); (0, 0) when fully covered."""
    if not intervals:
        return 0.0, 0.0
    intervals = sorted(intervals)
    best_gap, best_mid = 0.0, 0.0
    covered_to = intervals[0][1]
    for start, end in intervals[1:]:
        if start > covered_to:
            gap = start - covered_to
            if gap > best_gap:
                best_gap, best_mid = gap, (covered_to + start) / 2
        covered_to = max(covered_to, end)
    return best_gap, best_mid


def _xy_cut(boxes: list[Box], min_gap: float) -> list[Box]:
    """Recursive XY-cut: split on the widest projection gap (horizontal cuts
    preferred — top-to-bottom before left-to-right), recurse, concatenate."""
    if len(boxes) <= 1:
        return boxes
    y_gap, y_mid = _largest_gap([(b.y0, b.y1) for b in boxes])
    x_gap, x_mid = _largest_gap([(b.x0, b.x1) for b in boxes])
    if y_gap >= min_gap and y_gap >= x_gap:
        top = [b for b in boxes if b.y1 <= y_mid]
        bottom = [b for b in boxes if b.y1 > y_mid]
        if top and bottom:
            return _xy_cut(top, min_gap) + _xy_cut(bottom, min_gap)
    if x_gap >= min_gap:
        left = [b for b in boxes if b.x1 <= x_mid]
        right = [b for b in boxes if b.x1 > x_mid]
        if left and right:
            return _xy_cut(left, min_gap) + _xy_cut(right, min_gap)
    # No usable gap: fall back to (y, x) sort.
    return sorted(boxes, key=lambda b: (b.y0, b.x0))


def _furniture_key(box: Box, y_tol: float) -> tuple[str, int]:
    """Furniture identity: digit-normalized text + y-band. Digits collapse
    to '#' so 'Page 1'/'Page 2' and dated footers match across pages."""
    norm = "".join("#" if ch.isdigit() else ch for ch in box.text).strip().casefold()
    return norm, int(round(box.y0 / y_tol))


def strip_repeated_furniture(
    boxes: list[Box],
    min_pages: int = 2,
    y_tol: float = 2.0,
    margin_frac: float = 0.1,
) -> list[Box]:
    """Remove running headers/footers/page numbers: any box IN THE PAGE
    MARGINS (top/bottom ``margin_frac`` of the page's y-extent) whose
    (digit-normalized text, y-band) recurs on >= min_pages DISTINCT pages
    is page furniture, not content (the standard repeated-element
    heuristic in PDF content extraction, cf. pdffigures/GROBID zoning).
    The margin guard keeps template-like BODY layouts safe: repeated
    mid-page structure (forms, tables of figures) is content even when
    it aligns across pages."""
    if min_pages < 2:
        raise ValueError(f"min_pages must be >= 2, got {min_pages}")
    if not 0.0 < margin_frac < 0.5:
        raise ValueError(f"margin_frac must be in (0, 0.5), got {margin_frac}")
    if not boxes:
        return boxes
    y_max = max(b.y1 for b in boxes)
    top, bottom = y_max * margin_frac, y_max * (1.0 - margin_frac)

    def in_margin(b: Box) -> bool:
        return b.y1 <= top or b.y0 >= bottom

    pages_of: dict[tuple[str, int], set[int]] = {}
    for b in boxes:
        if not in_margin(b):
            continue
        key = _furniture_key(b, y_tol)
        if key[0]:
            pages_of.setdefault(key, set()).add(b.page)
    return [
        b
        for b in boxes
        if not in_margin(b)
        or len(pages_of.get(_furniture_key(b, y_tol), ())) < min_pages
    ]


_SOFT_HYPHEN = "­"


def dehyphenate_lines(lines: list[str]) -> str:
    """Join line fragments into flowing text, repairing end-of-line
    hyphenation (the standard PDF text-reflow heuristic — cf. pdfminer /
    GROBID line-merge rules; the reference never reflows PDFs because it
    skips them, url-helpers.ts:281):

    * soft hyphens (U+00AD) are discarded unconditionally — they only mark
      break opportunities, never content;
    * a line ending ``<letter>-`` followed by a line starting with a
      lowercase letter is a hyphenated word break: join WITHOUT the hyphen
      (``exam-`` + ``ple`` -> ``example``);
    * the same shape followed by an uppercase letter or digit is a true
      compound split (``state-`` + ``Machine``): keep the hyphen, join
      without a space;
    * everything else joins with a single space.
    """
    out = ""
    for raw in lines:
        line = raw.replace(_SOFT_HYPHEN, "").strip()
        if not line:
            continue
        if not out:
            out = line
            continue
        if out.endswith("-") and len(out) >= 2 and out[-2].isalpha():
            first = line[0]
            if first.islower():
                out = out[:-1] + line
            elif first.isupper() or first.isdigit():
                out = out + line
            else:
                out = out + " " + line
        else:
            out = out + " " + line
    return out


def reading_order(boxes: list[Box], min_gap: float = 10.0) -> list[Box]:
    """Natural reading order across pages: per page, recursive XY-cut."""
    out: list[Box] = []
    for page in sorted({b.page for b in boxes}):
        out.extend(_xy_cut([b for b in boxes if b.page == page], min_gap))
    return out


def extract_pdf_spans(
    payload: str,
    min_gap: float = 10.0,
    heading_height: float = 18.0,
    strip_furniture: bool = True,
    dehyphenate: bool = True,
) -> list[Span]:
    """pdf_text payload -> ordered spans. Boxes taller than heading_height
    (a font-size proxy) become headings; consecutive body lines in the same
    column merge into one text span, with end-of-line hyphenation repaired
    (dehyphenate_lines) unless dehyphenate=False. Running headers/footers/
    page numbers (same digit-normalized text at the same y on 2+ pages) are
    stripped before ordering unless strip_furniture=False."""
    boxes = parse_boxes(payload)
    if strip_furniture:
        boxes = strip_repeated_furniture(boxes)
    boxes = reading_order(boxes, min_gap)
    spans: list[Span] = []
    buffer: list[str] = []

    def flush() -> None:
        if buffer:
            joined = (
                dehyphenate_lines(buffer) if dehyphenate else " ".join(buffer)
            )
            spans.append(Span("text", joined))
            buffer.clear()

    for box in boxes:
        text = box.text.strip()
        if not text:
            continue
        if (box.y1 - box.y0) >= heading_height:
            flush()
            spans.append(Span("heading", "# " + text))
        else:
            buffer.append(text)
    flush()
    return spans
