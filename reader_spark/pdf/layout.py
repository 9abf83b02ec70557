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
) -> list[Span]:
    """pdf_text payload -> ordered spans. Boxes taller than heading_height
    (a font-size proxy) become headings; consecutive body lines in the same
    column merge into one text span."""
    boxes = reading_order(parse_boxes(payload), min_gap)
    spans: list[Span] = []
    buffer: list[str] = []

    def flush() -> None:
        if buffer:
            spans.append(Span("text", " ".join(buffer)))
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
