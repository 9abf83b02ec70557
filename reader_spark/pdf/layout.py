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
    tables: bool = True,
) -> list[Span]:
    """pdf_text payload -> ordered spans. Boxes taller than heading_height
    (a font-size proxy) become headings; consecutive body lines in the same
    column merge into one text span, with end-of-line hyphenation repaired
    (dehyphenate_lines) unless dehyphenate=False. Running headers/footers/
    page numbers (same digit-normalized text at the same y on 2+ pages) are
    stripped before ordering unless strip_furniture=False. Grid-aligned
    regions (detect_tables) become kind='table' GFM spans at their
    reading-order position unless tables=False."""
    boxes = parse_boxes(payload)
    if strip_furniture:
        boxes = strip_repeated_furniture(boxes)
    table_md: dict[str, str] = {}
    if tables:
        regions, boxes = detect_tables(boxes)
        for i, (page, bbox, rows) in enumerate(regions):
            # the region re-enters layout as ONE placeholder box at its
            # bbox, so XY-cut orders it like any other block
            marker = f"\x00TABLE{i}\x00"
            table_md[marker] = render_gfm_table(rows)
            boxes.append(Box(page, bbox[0], bbox[1], bbox[2], bbox[3], marker))
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
        if text in table_md:
            flush()
            spans.append(Span("table", table_md[text]))
        elif (box.y1 - box.y0) >= heading_height:
            flush()
            spans.append(Span("heading", "# " + text))
        else:
            buffer.append(text)
    flush()
    return spans


# --- table detection -------------------------------------------------------

def _y_bands(boxes: list[Box], y_tol: float) -> list[list[Box]]:
    """Group one page's boxes into horizontal bands: sorted by y0, a box
    joins the current band while its y0 is within y_tol of the band's
    first member."""
    bands: list[list[Box]] = []
    for box in sorted(boxes, key=lambda b: (b.y0, b.x0)):
        if bands and abs(box.y0 - bands[-1][0].y0) <= y_tol:
            bands[-1].append(box)
        else:
            bands.append([box])
    return bands


def _aligned(a: list[Box], b: list[Box], x_tol: float) -> bool:
    if len(a) != len(b):
        return False
    xa = sorted(box.x0 for box in a)
    xb = sorted(box.x0 for box in b)
    return all(abs(p - q) <= x_tol for p, q in zip(xa, xb))


def detect_tables(
    boxes: list[Box],
    x_tol: float = 4.0,
    y_tol: float = 3.0,
    min_rows: int = 3,
    min_cols: int = 3,
) -> tuple[list[tuple[int, tuple[float, float, float, float], list[list[str]]]], list[Box]]:
    """Grid-alignment table detection over positioned text boxes (the
    ruling-line-free heuristic: a run of >= min_rows consecutive y-bands
    whose >= min_cols x-starts repeat within x_tol IS a table — prose
    never column-aligns that consistently). min_cols=3 by default so a
    two-column BODY layout (two aligned x-starts per band) is never
    misread as a table; lower it only when layout is known.

    Returns (tables, rest): each table is (page, bbox, rows-of-cell-text
    in x order); rest = all boxes not swallowed by a table."""
    tables = []
    rest: list[Box] = []
    for page in sorted({b.page for b in boxes}):
        bands = _y_bands([b for b in boxes if b.page == page], y_tol)
        run: list[list[Box]] = []

        def close() -> None:
            nonlocal run
            if len(run) >= min_rows:
                cells = [
                    [c.text for c in sorted(band, key=lambda b: b.x0)]
                    for band in run
                ]
                allb = [b for band in run for b in band]
                bbox = (
                    min(b.x0 for b in allb),
                    min(b.y0 for b in allb),
                    max(b.x1 for b in allb),
                    max(b.y1 for b in allb),
                )
                tables.append((page, bbox, cells))
            else:
                rest.extend(b for band in run for b in band)
            run = []

        for band in bands:
            if len(band) >= min_cols and (
                not run or _aligned(run[0], band, x_tol)
            ):
                run.append(band)
            else:
                close()
                if len(band) >= min_cols:
                    run.append(band)
                else:
                    rest.extend(band)
        close()
    return tables, rest


def render_gfm_table(rows: list[list[str]]) -> str:
    """Cell rows -> GFM pipe table, same contract as the HTML
    serializer's _table (pipe-escape, ragged rows padded, first row is
    the header)."""
    rows = [
        [c.strip().replace("|", "\\|").replace("\n", " ") for c in r]
        for r in rows
    ]
    width = max(len(r) for r in rows)
    for r in rows:
        r.extend([""] * (width - len(r)))
    lines = ["| " + " | ".join(rows[0]) + " |"]
    lines.append("| " + " | ".join(["---"] * width) + " |")
    for r in rows[1:]:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)
