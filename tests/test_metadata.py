"""Port of the metadata battery contract
(/root/reference/tests/unit/metadata-extractor.test.ts) plus the ordering
contract from tests/unit/scraper-pipeline.test.ts:72-88."""

from reader_spark.config import ExtractorConfig
from reader_spark.extract.cleaner import clean_html
from reader_spark.extract.metadata import extract_metadata, extract_structured_data

BASE = "https://example.com"


class TestBasicFields:
    def test_title(self):
        meta = extract_metadata("<html><head><title>My Page</title></head></html>", BASE)
        assert meta["title"] == "My Page"

    def test_description(self):
        meta = extract_metadata(
            '<html><head><meta name="description" content="A great page"></head></html>',
            BASE,
        )
        assert meta["description"] == "A great page"

    def test_language(self):
        meta = extract_metadata('<html lang="en"><head></head></html>', BASE)
        assert meta["language"] == "en"

    def test_author(self):
        meta = extract_metadata(
            '<html><head><meta name="author" content="John Doe"></head></html>', BASE
        )
        assert meta["author"] == "John Doe"

    def test_canonical(self):
        meta = extract_metadata(
            '<html><head><link rel="canonical" href="https://example.com/canonical"></head></html>',
            BASE,
        )
        assert meta["canonical"] == "https://example.com/canonical"

    def test_favicon_fallback(self):
        meta = extract_metadata("<html><head></head></html>", BASE)
        assert "favicon.ico" in meta["favicon"]

    def test_charset(self):
        meta = extract_metadata('<html><head><meta charset="utf-8"></head></html>', BASE)
        assert meta["charset"] == "utf-8"

    def test_charset_http_equiv(self):
        meta = extract_metadata(
            '<html><head><meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1"></head></html>',
            BASE,
        )
        assert meta["charset"] == "ISO-8859-1"

    def test_keywords_split_trim(self):
        meta = extract_metadata(
            '<html><head><meta name="keywords" content="one, two , ,three"></head></html>',
            BASE,
        )
        assert meta["keywords"] == ["one", "two", "three"]

    def test_title_fallback_og(self):
        meta = extract_metadata(
            '<html><head><meta property="og:title" content="Only OG"></head></html>', BASE
        )
        assert meta["title"] == "Only OG"


class TestOpenGraphAndTwitter:
    def test_og_title(self):
        meta = extract_metadata(
            '<html><head><meta property="og:title" content="OG Title"></head></html>', BASE
        )
        assert meta["openGraph"]["title"] == "OG Title"

    def test_og_description(self):
        meta = extract_metadata(
            '<html><head><meta property="og:description" content="OG Desc"></head></html>',
            BASE,
        )
        assert meta["openGraph"]["description"] == "OG Desc"

    def test_og_image(self):
        meta = extract_metadata(
            '<html><head><meta property="og:image" content="https://example.com/image.jpg"></head></html>',
            BASE,
        )
        assert meta["openGraph"]["image"] == "https://example.com/image.jpg"
        # X11 image fallback chain
        assert meta["image"] == "https://example.com/image.jpg"

    def test_twitter_card(self):
        meta = extract_metadata(
            '<html><head><meta name="twitter:card" content="summary_large_image"></head></html>',
            BASE,
        )
        assert meta["twitter"]["card"] == "summary_large_image"

    def test_twitter_title(self):
        meta = extract_metadata(
            '<html><head><meta name="twitter:title" content="Tweet Title"></head></html>',
            BASE,
        )
        assert meta["twitter"]["title"] == "Tweet Title"

    def test_all_null_collapses(self):
        meta = extract_metadata("<html><head><title>T</title></head></html>", BASE)
        assert meta["openGraph"] is None
        assert meta["twitter"] is None


class TestEdgeCases:
    def test_no_metadata(self):
        meta = extract_metadata("<html><body><p>Hello</p></body></html>", BASE)
        assert meta["title"] is None
        assert meta["description"] is None

    def test_empty_html(self):
        meta = extract_metadata("", BASE)
        assert meta is not None
        assert meta["title"] is None

    def test_malformed_html(self):
        meta = extract_metadata("<html><head><title>Unclosed", BASE)
        assert meta["title"] == "Unclosed"


class TestOrderingContract:
    """Metadata must come from RAW html — after cleaning the head is gone
    (scraper-pipeline.test.ts:81-88)."""

    HTML = """
      <html><head><title>Example Page Title</title>
      <meta name="description" content="A test page for the content pipeline">
      </head><body><main><p>Body</p></main></body></html>
    """

    def test_metadata_before_cleaning(self):
        meta = extract_metadata(self.HTML, BASE)
        assert meta["title"] == "Example Page Title"

    def test_metadata_gone_after_cleaning(self):
        cleaned = clean_html(self.HTML, BASE, ExtractorConfig(only_main_content=False))
        meta = extract_metadata(cleaned, BASE)
        assert meta["title"] is None


class TestStructuredData:
    def test_ld_json(self):
        html = (
            '<html><head><script type="application/ld+json">{"@type": "Article"}'
            "</script></head></html>"
        )
        data = extract_structured_data(html)
        assert data == [{"@type": "Article"}]

    def test_invalid_ld_json_skipped(self):
        html = '<html><head><script type="application/ld+json">not json</script></head></html>'
        assert extract_structured_data(html) == []


class TestStreamScanParity:
    """extract_metadata_stream (no-tree tokenizer scan, the oversized-doc
    path) must be byte-identical to extract_metadata_dom(parse_html(html))
    on every shape the tree path handles."""

    CASES = [
        # plain head
        "<html lang='en'><head><title>T &amp; U</title>"
        "<meta name='description' content='d'>"
        "<link rel='icon' href='/i.png'></head><body><p>x</p></body></html>",
        # meta/link PAST the body (contract: still collected)
        "<html><body><p>deep</p><meta name='author' content='late'>"
        "<link rel='canonical' href='/c'></body></html>",
        # title inside script must NOT win; empty real title wins as ''
        "<script>var a = '<title>fake</title>';</script><title></title>"
        "<meta property='og:title' content='OG'>",
        # self-closing title, charset, http-equiv
        "<title/><meta charset='utf-8'>"
        "<meta http-equiv='Content-Type' content='text/html; charset=latin-1'>",
        # first-occurrence-wins duplicates + entities in attrs
        "<meta name='k' content='first'><meta name='k' content='second'>"
        "<meta property='og:image' content='/x?a=1&amp;b=2'>",
        # stray '<', unclosed rawtext, html lang on later html tag
        "<p>a < b</p><style>unclosed",
        "<div></div><html lang='fr'><title>late html</title>",
        # no metadata at all
        "<p>nothing here</p>",
    ]

    def test_parity_on_cases(self):
        from reader_spark.extract.metadata import (
            extract_metadata_dom,
            extract_metadata_stream,
        )
        from reader_spark.htmlkit.dom import parse_html

        for html in self.CASES:
            dom = extract_metadata_dom(parse_html(html), "https://x.test/a/b")
            stream = extract_metadata_stream(html, "https://x.test/a/b")
            assert stream == dom, html

    def test_parity_on_fixture_corpus_and_giant(self):
        from reader_spark import fixtures
        from reader_spark.extract.metadata import (
            extract_metadata_dom,
            extract_metadata_stream,
        )
        from reader_spark.htmlkit.dom import parse_html

        payloads = [
            s["text"]
            for d in fixtures.fixture_docs()
            for s in d["spans"]
            if s["kind"] == "html"
        ]
        payloads.append(fixtures.make_oversized_html())
        for html in payloads:
            dom = extract_metadata_dom(parse_html(html), "https://x.test/")
            assert extract_metadata_stream(html, "https://x.test/") == dom

    def test_oversized_pipeline_uses_full_doc_metadata(self):
        """A title + meta past the 2 MiB cap must still reach metadata
        (the ordering contract the stream scan exists to serve)."""
        from reader_spark.config import DEFAULT_CONFIG
        from reader_spark.extract.pipeline import extract_document

        filler = "<p>" + "word " * 200 + "</p>"
        body = filler * (DEFAULT_CONFIG.max_html_size // len(filler) + 2)
        html = (
            "<html><body>" + body +
            "<title>Past The Cap</title>"
            "<meta name='description' content='late-desc'>"
            "</body></html>"
        )
        assert len(html) > DEFAULT_CONFIG.max_html_size
        res = extract_document("g", html, "https://x.test/")
        assert res.metadata["title"] == "Past The Cap"
        assert res.metadata["description"] == "late-desc"
