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


def test_header_columns_footer_banding():
    # Classic layout: full-width title band, two body columns, full-width
    # footer. XY-cut must emit title -> left col -> right col -> footer.
    from reader_spark.pdf.layout import Box, reading_order

    boxes = [
        Box(0, 50, 700, 550, 720, "footer"),
        Box(0, 310, 120, 560, 140, "right-1"),
        Box(0, 40, 120, 290, 140, "left-1"),
        Box(0, 40, 20, 560, 50, "TITLE"),
        Box(0, 310, 150, 560, 170, "right-2"),
        Box(0, 40, 150, 290, 170, "left-2"),
    ]
    assert [b.text for b in reading_order(boxes)] == [
        "TITLE", "left-1", "left-2", "right-1", "right-2", "footer",
    ]


def test_multi_page_order():
    from reader_spark.pdf.layout import Box, reading_order

    boxes = [
        Box(1, 40, 20, 290, 40, "p2-first"),
        Box(0, 40, 100, 290, 120, "p1-second"),
        Box(0, 40, 20, 290, 40, "p1-first"),
    ]
    assert [b.text for b in reading_order(boxes)] == [
        "p1-first", "p1-second", "p2-first",
    ]


class TestFurnitureRemoval:
    def _doc(self):
        lines = []
        for p in range(3):
            lines.append(f"{p}\t40\t10\t550\t22\tACME Corp — Confidential")
            lines.append(f"{p}\t40\t300\t550\t312\tUnique body paragraph {p} text")
            lines.append(f"{p}\t270\t780\t330\t790\tPage {p + 1}")
        return "\n".join(lines)

    def test_headers_footers_and_page_numbers_stripped(self):
        from reader_spark.pdf.layout import extract_pdf_spans

        spans = extract_pdf_spans(self._doc())
        joined = " ".join(s.text for s in spans)
        assert "Confidential" not in joined
        assert "Page" not in joined
        for p in range(3):
            assert f"Unique body paragraph {p} text" in joined

    def test_digit_normalization_matches_varying_page_numbers(self):
        from reader_spark.pdf.layout import parse_boxes, strip_repeated_furniture

        boxes = parse_boxes(self._doc())
        kept = strip_repeated_furniture(boxes)
        assert all("Page" not in b.text for b in kept)

    def test_single_page_doc_untouched(self):
        from reader_spark.pdf.layout import extract_pdf_spans

        payload = (
            "0\t40\t10\t550\t22\tACME Corp — Confidential\n"
            "0\t40\t60\t550\t72\tBody text\n"
        )
        spans = extract_pdf_spans(payload)
        assert "Confidential" in " ".join(s.text for s in spans)

    def test_repeated_phrase_at_different_y_survives(self):
        from reader_spark.pdf.layout import extract_pdf_spans

        payload = (
            "0\t40\t100\t550\t112\tthe same phrase\n"
            "1\t40\t300\t550\t312\tthe same phrase\n"
        )
        spans = extract_pdf_spans(payload)
        assert sum("the same phrase" in s.text for s in spans) >= 1

    def test_min_pages_validation(self):
        import pytest as _pytest

        from reader_spark.pdf.layout import strip_repeated_furniture

        with _pytest.raises(ValueError, match="min_pages"):
            strip_repeated_furniture([], min_pages=1)

    def test_opt_out_keeps_furniture(self):
        from reader_spark.pdf.layout import extract_pdf_spans

        spans = extract_pdf_spans(self._doc(), strip_furniture=False)
        assert "Confidential" in " ".join(s.text for s in spans)

    def test_aligned_midpage_body_survives(self):
        """Template-like body (same normalized text, same mid-page y on
        every page) is CONTENT — the margin guard must protect it."""
        from reader_spark.pdf.layout import extract_pdf_spans

        lines = []
        for p in range(3):
            lines.append(f"{p}\t40\t10\t550\t22\tRunning Header")
            lines.append(f"{p}\t40\t400\t550\t412\tAmount due: {p} dollars")
            lines.append(f"{p}\t40\t780\t550\t790\tPage {p + 1}")
        spans = extract_pdf_spans("\n".join(lines))
        joined = " ".join(s.text for s in spans)
        assert "Amount due" in joined
        assert "Running Header" not in joined


class TestDehyphenation:
    """End-of-line hyphenation repair (layout.py dehyphenate_lines)."""

    def test_lowercase_continuation_merges(self):
        from reader_spark.pdf.layout import dehyphenate_lines

        assert dehyphenate_lines(["exam-", "ple text"]) == "example text"

    def test_uppercase_keeps_compound_hyphen(self):
        from reader_spark.pdf.layout import dehyphenate_lines

        assert dehyphenate_lines(["state-", "Machine"]) == "state-Machine"

    def test_digit_keeps_hyphen(self):
        from reader_spark.pdf.layout import dehyphenate_lines

        assert dehyphenate_lines(["top-", "10 list"]) == "top-10 list"

    def test_soft_hyphen_discarded(self):
        from reader_spark.pdf.layout import dehyphenate_lines

        assert dehyphenate_lines(["soft­hyphen here"]) == "softhyphen here"

    def test_non_letter_before_dash_joins_with_space(self):
        from reader_spark.pdf.layout import dehyphenate_lines

        # "stays -" ends with '-' but the char before it is a space, not a
        # letter: that's punctuation, not a word break.
        assert dehyphenate_lines(["stays -", "intact"]) == "stays - intact"

    def test_empty_and_blank_lines_skipped(self):
        from reader_spark.pdf.layout import dehyphenate_lines

        assert dehyphenate_lines(["", "  ", "only line"]) == "only line"

    def test_golden_hyphenated_fixture(self):
        from reader_spark.pdf.layout import extract_pdf_spans

        p = fixtures.pdf_boxes_payload(fixtures.PDF_HYPHENATED_BOXES)
        spans = extract_pdf_spans(p)
        assert [(s.kind, s.text) for s in spans] == [
            ("heading", "# Hyphenation Test Title"),
            (
                "text",
                "The quick deterministic corpus uses a state-Machine to "
                "reflow fragmented lines with a softhyphen inside. "
                "Trailing dash stays - intact.",
            ),
        ]

    def test_opt_out_preserves_raw_join(self):
        from reader_spark.pdf.layout import extract_pdf_spans

        p = fixtures.pdf_boxes_payload(fixtures.PDF_HYPHENATED_BOXES)
        spans = extract_pdf_spans(p, dehyphenate=False)
        body = spans[1].text
        assert "deter- ministic" in body

    def test_two_column_fixture_unchanged(self):
        """No hyphens in the original fixture: dehyphenation is a no-op
        there, so the pdf_extract golden oracle stays stable."""
        from reader_spark.pdf.layout import extract_pdf_spans

        assert extract_pdf_spans(payload()) == extract_pdf_spans(
            payload(), dehyphenate=False
        )


class TestLigatureFold:
    def test_all_seven_ligatures(self, spark):
        from pyspark.sql import Row

        from reader_spark.spark.columns import fold_ligatures_col

        df = spark.createDataFrame(
            [Row(t="ﬁne ﬂow oﬀer eﬃcient waﬄe ﬅop ﬆar plain")]
        )
        got = df.select(fold_ligatures_col(df.t).alias("o")).collect()[0].o
        assert got == "fine flow offer efficient waffle stop star plain"

    def test_no_op_on_clean_text(self, spark):
        from pyspark.sql import Row

        from reader_spark.spark.columns import fold_ligatures_col

        df = spark.createDataFrame([Row(t="already clean fi fl text")])
        got = df.select(fold_ligatures_col(df.t).alias("o")).collect()[0].o
        assert got == "already clean fi fl text"


class TestTypographyFold:
    def test_all_eight_folds(self, spark):
        from pyspark.sql import Row

        from reader_spark.spark.columns import fold_typography_col

        raw = "“q” ‘s’ a–b c—d e… f g"
        df = spark.createDataFrame([Row(t=raw)])
        got = df.select(fold_typography_col(df.t).alias("o")).collect()[0].o
        assert got == '"q" \'s\' a-b c-d e... f g'

    def test_improves_dedup_consistency(self, spark):
        # typographically-different twins hash together after folding
        from pyspark.sql import Row, functions as F

        from reader_spark.spark.columns import fold_typography_col

        df = spark.createDataFrame(
            [
                Row(doc_id=1, t="he said “hello” — loudly"),
                Row(doc_id=2, t='he said "hello" - loudly'),
            ]
        )
        hashes = (
            df.select(F.md5(fold_typography_col(df.t)).alias("h"))
            .distinct()
            .count()
        )
        assert hashes == 1


class TestTableDetection:
    def _payload(self, boxes):
        from reader_spark.fixtures import pdf_boxes_payload

        return pdf_boxes_payload(boxes)

    TABLE = [
        # page, x0, y0, x1, y1, text — a 3x3 grid under a body line
        (0, 50, 40, 500, 52, "Results are summarized below."),
        (0, 50, 100, 140, 112, "name"), (0, 200, 100, 290, 112, "count"),
        (0, 350, 100, 440, 112, "share"),
        (0, 50, 120, 140, 132, "alpha"), (0, 200, 120, 290, 132, "10"),
        (0, 350, 120, 440, 132, "0.5"),
        (0, 50, 140, 140, 152, "beta"), (0, 200, 140, 290, 152, "7 | 8"),
        (0, 350, 140, 440, 152, "0.3"),
        (0, 50, 200, 500, 212, "Discussion follows the table."),
    ]

    def test_grid_becomes_table_span_in_order(self):
        from reader_spark.pdf.layout import extract_pdf_spans

        spans = extract_pdf_spans(self._payload(self.TABLE))
        kinds = [s.kind for s in spans]
        assert kinds == ["text", "table", "text"]
        gfm = spans[1].text
        assert gfm.splitlines()[0] == "| name | count | share |"
        assert gfm.splitlines()[1] == "| --- | --- | --- |"
        assert "| beta | 7 \\| 8 | 0.3 |" in gfm  # pipe-escape contract
        assert spans[0].text == "Results are summarized below."

    def test_two_column_body_not_misdetected(self):
        from reader_spark.pdf.layout import detect_tables, parse_boxes

        two_col = [
            (0, 50, 100 + 20 * i, 280, 112 + 20 * i, f"left {i}")
            for i in range(5)
        ] + [
            (0, 320, 100 + 20 * i, 550, 112 + 20 * i, f"right {i}")
            for i in range(5)
        ]
        tables, rest = detect_tables(parse_boxes(self._payload(two_col)))
        assert tables == []
        assert len(rest) == 10

    def test_ragged_rows_break_the_run(self):
        from reader_spark.pdf.layout import detect_tables, parse_boxes

        ragged = [
            (0, 50, 100, 140, 112, "a"), (0, 200, 100, 290, 112, "b"),
            (0, 350, 100, 440, 112, "c"),
            # second band: only 2 cells -> run breaks at length 1
            (0, 50, 120, 140, 132, "d"), (0, 200, 120, 290, 132, "e"),
            (0, 50, 140, 140, 152, "f"), (0, 200, 140, 290, 152, "g"),
            (0, 350, 140, 440, 152, "h"),
        ]
        tables, rest = detect_tables(parse_boxes(self._payload(ragged)))
        assert tables == []
        assert len(rest) == 8

    def test_alignment_jitter_within_tolerance(self):
        from reader_spark.pdf.layout import detect_tables, parse_boxes

        jitter = []
        for r in range(3):
            for c, x in enumerate((50, 200, 350)):
                jitter.append(
                    (0, x + r, 100 + 20 * r, x + 90, 112 + 20 * r,
                     f"c{r}{c}")
                )
        tables, rest = detect_tables(parse_boxes(self._payload(jitter)))
        assert len(tables) == 1 and rest == []
        assert tables[0][2][0] == ["c00", "c01", "c02"]

    def test_opt_out_keeps_flow(self):
        from reader_spark.pdf.layout import extract_pdf_spans

        spans = extract_pdf_spans(self._payload(self.TABLE), tables=False)
        assert all(s.kind != "table" for s in spans)

    def test_pipeline_roundtrip_table_span(self, spark):
        from reader_spark.extract.pipeline import extract_document

        res = extract_document(
            "pdf-table", self._payload(self.TABLE), "", payload_kind="pdf_text"
        )
        assert res.error_kind is None
        assert [s.kind for s in res.spans] == ["text", "table", "text"]
        assert "| name | count | share |" in res.markdown
