"""Port of the cleaning contract
(/root/reference/tests/unit/content-cleaner.test.ts)."""

import pytest

from reader_spark.config import ExtractorConfig
from reader_spark.extract.cleaner import clean_html

CFG = ExtractorConfig()
CFG_FULL = ExtractorConfig(only_main_content=False)


def clean(html, base="https://example.com", cfg=CFG):
    return clean_html(html, base, cfg)


class TestScriptStyleRemoval:
    def test_removes_script(self):
        out = clean("<html><body><script>alert('xss')</script><p>Content</p></body></html>")
        assert "<script" not in out
        assert "Content" in out

    def test_removes_style(self):
        out = clean("<html><body><style>.x { color: red }</style><p>Content</p></body></html>")
        assert "<style" not in out
        assert "Content" in out

    def test_removes_noscript(self):
        out = clean("<html><body><noscript>Enable JS</noscript><p>Content</p></body></html>")
        assert "Enable JS" not in out


class TestOnlyMainContent:
    HTML = """
        <html><body>
          <nav>Navigation links</nav>
          <header>Site header</header>
          <main><p>Main article content here that is long enough to not be filtered</p></main>
          <footer>Footer info</footer>
        </body></html>
    """

    def test_removes_nav_header_footer(self):
        out = clean(self.HTML)
        assert "Main article content" in out
        assert "Navigation links" not in out
        assert "Footer info" not in out

    def test_keeps_when_disabled(self):
        html = """
            <html><body>
              <nav>Navigation links</nav>
              <p>Main content</p>
              <footer>Footer info</footer>
            </body></html>
        """
        out = clean(html, cfg=CFG_FULL)
        assert "Navigation links" in out
        assert "Main content" in out
        assert "Footer info" in out

    def test_protects_content_inside_removable(self):
        html = """
            <html><body>
              <header>
                <div id="content"><p>This is the real content</p></div>
              </header>
            </body></html>
        """
        assert "This is the real content" in clean(html)


class TestDoesNotStripLegitimateContent:
    def test_preserves_dialog_class_substring(self):
        html = """
            <html><body class="skin uls-dialog-sticky-hide action-view">
              <div id="content">
                <p>This is the real article content that should survive cleaning.</p>
              </div>
            </body></html>
        """
        assert "real article content" in clean(html, "https://en.wikipedia.org/wiki/Test")

    def test_preserves_forms_and_inputs(self):
        html = """
            <html><body>
              <form><label>Search: <input type="text" value="query"></label></form>
              <p>Content</p>
            </body></html>
        """
        assert "Search:" in clean(html, cfg=CFG_FULL)

    def test_preserves_aria_hidden(self):
        html = """
            <html><body>
              <div aria-hidden="true"><p>Hidden but potentially real content</p></div>
              <p>Visible</p>
            </body></html>
        """
        assert "Hidden but potentially real content" in clean(html, cfg=CFG_FULL)


class TestWikipediaProtection:
    def test_mw_content_text_protected(self):
        html = """
            <html><body class="mediawiki uls-dialog-sticky-hide">
              <div id="mw-page-base"></div>
              <nav id="p-personal"><a href="/login">Log in</a></nav>
              <div id="content">
                <h1 id="firstHeading">Web scraping</h1>
                <div id="bodyContent">
                  <div id="mw-content-text">
                    <p>Web scraping is the process of extracting data from websites. {}</p>
                    <p>It involves making HTTP requests, parsing HTML, and extracting the content of interest.</p>
                  </div>
                </div>
              </div>
              <footer>Wikipedia footer</footer>
            </body></html>
        """.format("More body text. " * 20)
        out = clean(html, "https://en.wikipedia.org/wiki/Web_scraping")
        assert "Web scraping is the process" in out
        assert "HTTP requests" in out
        assert "Wikipedia footer" not in out
        assert "Log in" not in out

    def test_mintlify_main_relative(self):
        html = """
            <html><body>
              <nav>Sidebar nav</nav>
              <main class="relative max-w-4xl">
                <h1>Welcome to Docs</h1>
                <p>Docs body. {}</p>
                <p>Get started by reading the API reference.</p>
              </main>
              <footer>Doc footer</footer>
            </body></html>
        """.format("Documentation body text. " * 15)
        out = clean(html, "https://docs.test/welcome")
        assert "Welcome to Docs" in out
        assert "Documentation body text" in out
        assert "Doc footer" not in out


class TestSelectorFiltering:
    def test_exclude_tags(self):
        html = """
            <html><body>
              <div class="comments">User comments here</div>
              <p>Main content paragraph</p>
            </body></html>
        """
        out = clean(html, cfg=ExtractorConfig(exclude_tags=(".comments",)))
        assert "User comments" not in out
        assert "Main content" in out

    def test_include_tags(self):
        html = """
            <html><body>
              <div class="sidebar">Sidebar</div>
              <div class="article-content">Article text</div>
              <div class="footer">Footer</div>
            </body></html>
        """
        out = clean(
            html, cfg=ExtractorConfig(include_tags=(".article-content",))
        )
        assert "Article text" in out


class TestEdgeCases:
    def test_empty_raises(self):
        with pytest.raises(ValueError):
            clean("")

    def test_whitespace_raises(self):
        with pytest.raises(ValueError):
            clean("   \n\t   ")

    def test_minimal_structure(self):
        assert clean("<html><body></body></html>") is not None

    def test_preserves_text(self):
        out = clean(
            "<html><body><h1>Title</h1><p>Paragraph with <strong>bold</strong> text.</p></body></html>"
        )
        assert "Title" in out
        assert "bold" in out


class TestUrlHandling:
    def test_absolutifies(self):
        out = clean('<html><body><a href="/page">Link</a><img src="/img.png"></body></html>')
        assert "https://example.com/page" in out
        assert "https://example.com/img.png" in out

    def test_srcset_largest(self):
        out = clean(
            '<html><body><img srcset="small.jpg 200w, large.jpg 800w" src="tiny.jpg"></body></html>'
        )
        assert "large.jpg" in out
        assert 'src="tiny.jpg"' not in out


class TestBase64Removal:
    def test_removes_base64_img(self):
        out = clean(
            '<html><body><img src="data:image/png;base64,abc123"><p>Content</p></body></html>'
        )
        assert "data:image" not in out
        assert "Content" in out

    def test_scrubs_style_background(self):
        out = clean(
            '<html><body><div style="background:url(data:image/png;base64,xyz); color:red">T</div></body></html>'
        )
        assert "data:image" not in out

    def test_removes_source_elements(self):
        out = clean(
            '<html><body><picture><source srcset="data:image/png;base64,x"><img src="/a.png"></picture></body></html>'
        )
        assert "data:image" not in out


class TestCommentRemoval:
    def test_removes_comments(self):
        out = clean("<html><body><!-- hidden --><p>Visible</p></body></html>")
        assert "hidden" not in out
        assert "Visible" in out
