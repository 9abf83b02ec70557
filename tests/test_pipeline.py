"""End-to-end per-document pipeline contracts
(/root/reference/tests/unit/scraper-pipeline.test.ts) + golden span tests on
the fixture corpus (the north-rule invariant: span-sequence equality on
(kind, text, media_ref, order))."""

from reader_spark import fixtures
from reader_spark.config import ExtractorConfig
from reader_spark.extract.pipeline import detect_json_payload, extract_document


def payload_of(doc: dict) -> str:
    return "".join(
        s["text"] for s in sorted(doc["spans"], key=lambda s: s["offset"])
    )


def run(doc_id: str, cfg: ExtractorConfig = ExtractorConfig()):
    doc = next(d for d in fixtures.fixture_docs() if d["doc_id"] == doc_id)
    return extract_document(
        doc_id, payload_of(doc), fixtures.base_url_for(doc_id), cfg
    )


class TestGenericSample:
    def test_metadata_extracted(self):
        res = run("generic-sample")
        assert res.metadata["title"] == "Generic Page Title"
        assert res.metadata["description"] == "A generic page for the content pipeline"
        assert res.metadata["openGraph"]["title"] == "Generic OG Title"
        assert res.metadata["openGraph"]["image"] == "https://fixtures.test/og.png"
        assert res.metadata["twitter"]["card"] == "summary_large_image"

    def test_only_main_content(self):
        res = run("generic-sample")
        assert "Welcome to Generic" in res.markdown
        assert "© 2026 Generic Corp" not in res.markdown

    def test_full_content_without_main_only(self):
        res = run("generic-sample", ExtractorConfig(only_main_content=False))
        assert "Welcome to Generic" in res.markdown
        assert "meaningful content" in res.markdown
        assert len(res.markdown) > 50

    def test_standalone_link_becomes_link_span(self):
        res = run("generic-sample")
        links = [s for s in res.spans if s.kind == "link"]
        assert links and links[0].media_ref == "https://fixtures.test/link"
        assert links[0].text == "[A useful link](https://fixtures.test/link)"


class TestWikipediaLike:
    def test_substantial_markdown_with_table(self):
        res = run("wikipedia-like")
        assert "Data extraction" in res.markdown
        assert "Techniques" in res.markdown
        assert "HTTP" in res.markdown
        assert "|" in res.markdown
        assert len(res.markdown) > 200

    def test_nav_removed(self):
        res = run("wikipedia-like")
        assert "Main Page" not in res.markdown

    def test_table_span(self):
        res = run("wikipedia-like")
        tables = [s for s in res.spans if s.kind == "table"]
        assert len(tables) == 1
        lines = tables[0].text.split("\n")
        assert lines[0] == "| Method | Description |"
        assert lines[1] == "| --- | --- |"
        assert lines[2] == "| HTTP | Direct request |"


class TestSaasLanding:
    def test_headings_and_list(self):
        res = run("saas-landing")
        assert "Ship faster with Zenith" in res.markdown
        assert "Features" in res.markdown
        assert "- Instant deployments" in res.markdown
        assert "Privacy" not in res.markdown  # footer stripped


class TestSimpleStatic:
    def test_golden_span_sequence(self):
        res = run("simple-static")
        got = [(s.kind, s.text, s.media_ref) for s in res.spans]
        assert got == [
            ("heading", "# Simple Fixture Page", None),
            ("text", "This is a synthetic static page used for testing the extraction engine.", None),
            ("text", "It contains multiple paragraphs with **bold text** and *italic text*.", None),
            ("heading", "## Section Two", None),
            (
                "text",
                "More content in the second section. Here is a [link to another page](https://fixtures.test/other).",
                None,
            ),
            ("list_item", "- First item", None),
            ("list_item", "- Second item", None),
            ("list_item", "- Third item", None),
        ]

    def test_metadata(self):
        res = run("simple-static")
        assert res.metadata["title"] == "Simple Fixture Page"
        assert res.metadata["language"] == "en"
        assert res.metadata["charset"] == "utf-8"
        assert res.metadata["canonical"] == "https://fixtures.test/simple-static"


class TestMediaRich:
    def test_golden_span_sequence(self):
        res = run("media-rich")
        got = [(s.kind, s.text, s.media_ref) for s in res.spans]
        assert got == [
            ("heading", "# Gallery", None),
            ("text", "Intro paragraph before any media appears in the flow.", None),
            (
                "image",
                "![Hero image](https://fixtures.test/hero-large.jpg)",
                "https://fixtures.test/hero-large.jpg",
            ),
            ("text", "Between images there is prose content.", None),
            (
                "image",
                "![Self linked](https://fixtures.test/photo.png)",
                "https://fixtures.test/photo.png",
            ),
            ("text", "A paragraph after the self-linked image.", None),
            (
                "text",
                "Closing words with a [relative link](https://fixtures.test/relative/page).",
                None,
            ),
        ]

    def test_skip_link_removed_and_base64_gone(self):
        res = run("media-rich")
        assert "Skip to Content" not in res.markdown
        assert "data:image" not in res.markdown

    def test_srcset_resolved_to_largest(self):
        res = run("media-rich")
        assert "hero-large.jpg" in res.markdown
        assert "hero-small" not in res.markdown


class TestJsonPayload:
    def test_detection(self):
        assert detect_json_payload('{"key": "value"}', 500_000) is not None
        assert detect_json_payload("[1, 2]", 500_000) is not None
        assert detect_json_payload("not json", 500_000) is None
        assert detect_json_payload('"just a string"', 500_000) is None
        assert detect_json_payload("{bad json}", 500_000) is None

    def test_cap(self):
        big = '{"k": "' + "x" * 500_001 + '"}'
        assert detect_json_payload(big, 500_000) is None

    def test_short_circuit_span(self):
        res = run("json-payload")
        assert len(res.spans) == 1
        span = res.spans[0]
        assert span.kind == "json"
        assert span.text.startswith("```json\n")
        assert span.text.endswith("\n```")
        assert '"items"' in span.text
        assert res.metadata is None
        assert res.markdown == span.text


class TestEdgeDocs:
    def test_empty_page_yields_no_spans(self):
        res = run("empty-page")
        assert res.spans == []
        assert res.markdown == ""
        assert res.ok
        assert res.metadata["title"] is None

    def test_scripts_only(self):
        res = run("scripts-only")
        assert "alert" not in res.markdown
        assert "track()" not in res.markdown

    def test_empty_payload_is_error_row(self):
        res = extract_document("nothing", "", "https://fixtures.test/nothing")
        assert res.error_kind == "EmptyDocumentError"
        assert res.spans == []

    def test_protected_content_survives(self):
        res = run("protected-content")
        assert "This is the real content kept by protection." in res.markdown

    def test_dialog_class_body_survives(self):
        res = run("dialog-class-body")
        assert "real article content" in res.markdown

    def test_oversized_truncated_but_extracted(self):
        res = run("oversized")
        assert res.ok
        assert "Oversized filler paragraph" in res.markdown
        # Input >2 MiB was truncated to the guard before serialization.
        assert len(res.markdown) <= 2 * 1024 * 1024

    def test_metadata_extracted_before_truncation(self):
        """Ordering contract (scraper.ts:225, 242-256): metadata comes from
        the FULL raw document; the size guard applies only before
        conversion. A <title>/<meta> past the cap must still reach the
        metadata columns, while the markdown reflects the truncated body."""
        import dataclasses

        from reader_spark.config import DEFAULT_CONFIG

        cfg = dataclasses.replace(DEFAULT_CONFIG, max_html_size=1000)
        filler = "<style>" + "x" * 1500 + "</style>"
        html = (
            "<html><head>"
            + filler
            + '<title>Late Title</title><meta name="description" content="late desc">'
            + "</head><body><p>body text here</p></body></html>"
        )
        res = extract_document("late-head", html, "https://fixtures.test/x", cfg=cfg)
        assert res.ok
        assert res.metadata["title"] == "Late Title"
        assert res.metadata["description"] == "late desc"
        # conversion saw only the first 1000 chars: the body is gone
        assert "body text here" not in res.markdown

    def test_nesting_bomb_extracts_instead_of_erroring(self):
        """A 5000-deep nesting bomb must not RecursionError the pipeline:
        the parser caps tree depth (browsers do the same) so the content
        still reaches the serializer and the markdown."""
        deep = (
            "<html><body>"
            + "<div>" * 5000
            + "content survives the bomb"
            + "</div>" * 5000
            + "</body></html>"
        )
        res = extract_document("bomb", deep, "https://fixtures.test/bomb")
        assert res.ok
        assert "content survives the bomb" in res.markdown

    def test_deep_list_bomb_extracts(self):
        deepl = (
            "<html><body>" + "<ul><li>x" * 2000 + "</li></ul>" * 2000 + "</body></html>"
        )
        res = extract_document("listbomb", deepl, "https://fixtures.test/lb")
        assert res.ok
        assert "x" in res.markdown

    def test_oversized_real_2mib_head_straddles_cap(self):
        """The same contract at the real 2 MiB cap: a document whose head
        content straddles the cap yields reference-ordered metadata."""
        cap = 2 * 1024 * 1024
        filler = "<style>" + "y" * (cap + 1024) + "</style>"
        html = (
            "<html><head>"
            + filler
            + "<title>Beyond Cap</title></head>"
            + "<body><p>short body</p></body></html>"
        )
        res = extract_document("2mib-head", html, "https://fixtures.test/y")
        assert res.ok
        assert res.metadata["title"] == "Beyond Cap"


class TestEmptyMainFallback:
    def test_reclean_without_main_only(self):
        # All content lives in <nav> — main-only cleaning leaves nothing,
        # so the pipeline re-runs with onlyMainContent=False (C11).
        html = (
            "<html><body><nav>"
            + "<p>Navigation-only page body text. </p>" * 20
            + "</nav></body></html>"
        )
        res = extract_document("nav-only", html, "https://fixtures.test/nav-only")
        assert "Navigation-only page body text." in res.markdown


class TestBlockDetection:
    CFG = ExtractorConfig(block_patterns=(r"Checking your browser", r"Just a moment"))

    def test_unopinionated_default(self):
        res = run("cloudflare-challenge")
        assert res.ok  # no config -> no content-based blocking

    def test_configured_blocks(self):
        res = run("cloudflare-challenge", self.CFG)
        assert res.error_kind == "BlockedPageError"
        assert res.spans == []


class TestSpanOrdering:
    def test_orders_are_dense_and_sequential(self):
        res = run("simple-static")
        # spans list index IS the order; engine assigns order = position
        assert [s.kind for s in res.spans][0] == "heading"


class TestFormatsRegistry:
    def test_html_format_emits_cleaned_html(self):
        from reader_spark.config import ExtractorConfig

        res = run("generic-sample", ExtractorConfig(formats=("markdown", "html")))
        assert res.html is not None
        assert "Welcome to Generic" in res.html
        assert "<script" not in res.html
        assert "footer" not in res.html.lower() or "Generic Corp" not in res.html

    def test_html_format_off_by_default(self):
        res = run("generic-sample")
        assert res.html is None

    def test_invalid_format_rejected(self):
        import pytest as _pytest

        from reader_spark.config import ExtractorConfig

        with _pytest.raises(ValueError):
            ExtractorConfig(formats=("markdown", "screenshot"))


class TestBotWallFixture:
    """Shape of the reference's block-detector fixture contract
    (tests/unit/block-detector-fixtures.test.ts): config-driven detection,
    unopinionated without config."""

    CONFIG = ExtractorConfig(
        block_patterns=(
            r"click the button below to continue shopping",
            r"to discuss automated access",
        )
    )

    def test_detected_with_config(self):
        res = run("shop-bot-wall", self.CONFIG)
        assert res.error_kind == "BlockedPageError"

    def test_not_detected_without_config(self):
        res = run("shop-bot-wall")
        assert res.ok

    def test_title_patterns(self):
        from reader_spark.functions.text import detect_bot_title, is_blocked_status

        assert detect_bot_title("Just a moment...", (r"just a moment",))
        assert not detect_bot_title("Real Article", (r"just a moment",))
        assert not detect_bot_title("Anything", ())
        assert is_blocked_status(403) == (True, "forbidden")
        assert is_blocked_status(429) == (True, "rate_limited")
        assert is_blocked_status(200) == (False, "")


class TestKitchenSink:
    def test_golden_span_sequence(self):
        res = run("kitchen-sink")
        got = [(s.kind, s.text, s.media_ref) for s in res.spans]
        assert got == [
            ("heading", "# Kitchen Sink", None),
            ("text", "> A quoted insight worth keeping.", None),
            ("list_item", "1. Step one", None),
            ("list_item", "2. Step two", None),
            ("list_item", "- Parent item", None),
            ("list_item", "  - Child item", None),
            ("list_item", "- [x] Shipped feature", None),
            (
                "text",
                "Inline `code()` and a bare link <https://fixtures.test/auto>.",
                None,
            ),
            ("text", "---", None),
            ("code", "```\ndef f():\n    return 42\n```", None),
            ("table", "| K | V |\n| --- | --- |\n| a | 1 |", None),
            (
                "image",
                "![A figure](https://fixtures.test/fig.png)",
                "https://fixtures.test/fig.png",
            ),
            ("text", "Figure caption text.", None),
            ("text", "Term", None),
            ("text", "Definition of the term.", None),
        ]


class TestExampleDomainGolden:
    """Markdown shape of the reference's golden end-to-end sample
    (result.md:4): heading + paragraph + standalone [Learn more](...) link."""

    def test_markdown(self):
        res = run("example-domain")
        assert res.markdown == (
            "# Example Domain\n\n"
            "This domain is for use in documentation examples without "
            "needing permission. Avoid use in operations.\n\n"
            "[Learn more](https://iana.org/domains/example)"
        )

    def test_metadata(self):
        res = run("example-domain")
        assert res.metadata["title"] == "Example Domain"
        assert res.metadata["language"] == "en"
        assert (
            res.metadata["favicon"]
            == "https://fixtures.test/favicon.ico"  # fallback /favicon.ico (X5)
        )
        assert res.metadata["openGraph"] is None


class TestFixedPoint:
    def test_reextracting_cleaned_html_is_identity(self):
        """Self-consistency: extraction is a FIXED POINT — running the
        pipeline on its own cleaned-HTML output (M3) yields the identical
        span sequence. Guards against cleaning/serialization steps that
        damage already-clean markup (a second pass must change nothing)."""
        from dataclasses import replace

        from reader_spark import fixtures
        from reader_spark.config import DEFAULT_CONFIG
        from reader_spark.extract.pipeline import extract_document

        cfg = replace(DEFAULT_CONFIG, formats=("markdown", "html"))
        checked = 0
        for d in fixtures.fixture_docs():
            if d["doc_id"] == "pdf-two-column":
                continue
            payload = "".join(
                s["text"] or ""
                for s in sorted(d["spans"], key=lambda s: s["offset"])
            )
            base = fixtures.base_url_for(d["doc_id"])
            r1 = extract_document(d["doc_id"], payload, base, cfg, d["spans"][0]["kind"])
            if r1.error_kind or r1.html is None:
                continue
            r2 = extract_document(d["doc_id"], r1.html, base, cfg, "html")
            assert [(s.kind, s.text, s.media_ref) for s in r1.spans] == [
                (s.kind, s.text, s.media_ref) for s in r2.spans
            ], d["doc_id"]
            checked += 1
        assert checked >= 8  # the fixture corpus really exercises this
