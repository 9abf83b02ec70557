"""PDF layout parser: column detection + XY-cut reading order golden tests
(delta (b) — no reference equivalent; contract defined by FIXTURES.md
`pdf-two-column`)."""

from reader_spark import fixtures
from reader_spark.extract.pipeline import extract_document
from reader_spark.pdf.layout import extract_pdf_spans, parse_boxes, reading_order


def payload():
    return fixtures.pdf_boxes_payload(fixtures.PDF_TWO_COLUMN_BOXES)


def test_parse_boxes():
    boxes = parse_boxes(payload())
    assert len(boxes) == 8
    assert boxes[0].text == "Two Column Paper Title"
    assert boxes[0].page == 1


def test_reading_order_columns():
    ordered = [b.text for b in reading_order(parse_boxes(payload()))]
    assert ordered == [
        "Two Column Paper Title",
        "Left column first line.",
        "Left column second line.",
        "Left column third line.",
        "Right column first line.",
        "Right column second line.",
        "Second Page Heading",
        "Full width body line on page two.",
    ]


def test_golden_spans():
    spans = extract_pdf_spans(payload())
    assert [(s.kind, s.text) for s in spans] == [
        ("heading", "# Two Column Paper Title"),
        (
            "text",
            "Left column first line. Left column second line. "
            "Left column third line. Right column first line. "
            "Right column second line.",
        ),
        ("heading", "# Second Page Heading"),
        ("text", "Full width body line on page two."),
    ]


def test_pipeline_dispatch():
    res = extract_document(
        "pdf-two-column",
        payload(),
        "https://fixtures.test/pdf-two-column",
        payload_kind="pdf_text",
    )
    assert res.ok
    assert res.spans[0].kind == "heading"
    assert "Left column first line." in res.markdown


def test_single_column_fallback_sort():
    # No gaps anywhere: falls back to (y, x) ordering.
    boxes = "\n".join(
        [
            "1\t0\t20\t100\t28\tsecond",
            "1\t0\t10\t100\t18\tfirst",
        ]
    )
    ordered = [b.text for b in reading_order(parse_boxes(boxes))]
    assert ordered == ["first", "second"]


def test_malformed_line_is_error_row():
    res = extract_document(
        "bad-pdf", "not\ta\tvalid\tline", "https://x", payload_kind="pdf_text"
    )
    assert res.error_kind == "ValueError"
