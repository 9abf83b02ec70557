"""Readability scoring (delta (a)): opt-in mode + C11 last-resort arm.
Must stay OFF by default so selector-pipeline fixture parity holds."""

from reader_spark.config import ExtractorConfig
from reader_spark.extract.pipeline import extract_document
from reader_spark.htmlkit.dom import parse_html
from reader_spark.readability import score_node, select_main_content

ARTICLE_PAGE = """
<html><body>
  <div class="nav-wrapper"><a href="/">Home</a><a href="/a">A</a><a href="/b">B</a></div>
  <article class="post">
    <h1>The Real Story</h1>
    <p>{}</p>
    <p>More meaningful prose follows in a second paragraph of the article body.</p>
  </article>
  <div class="sidebar-related"><a href="/x">x</a><a href="/y">y</a><a href="/z">z</a></div>
</body></html>
""".format("Long body prose. " * 30)


class TestScoring:
    def test_article_beats_link_farms(self):
        doc = parse_html(ARTICLE_PAGE)
        best = select_main_content(doc)
        assert best is not None
        assert best.tag == "article"

    def test_link_density_penalty(self):
        linky = parse_html(
            "<div>" + '<a href="/l">link text here</a>' * 10 + "</div>"
        ).find_first("div")
        texty = parse_html(
            "<div>" + "plain prose text here " * 10 + "</div>"
        ).find_first("div")
        assert score_node(texty) > score_node(linky)

    def test_empty_scores_zero(self):
        doc = parse_html("<div></div>")
        assert select_main_content(doc) is None


class TestOptInMode:
    def test_opt_in_selects_container(self):
        cfg = ExtractorConfig(only_main_content=False, readability_scoring=True)
        res = extract_document("d", ARTICLE_PAGE, "https://t.test/d", cfg)
        assert "The Real Story" in res.markdown
        assert "Home" not in res.markdown  # nav div outscored

    def test_off_by_default(self):
        cfg = ExtractorConfig(only_main_content=False)
        res = extract_document("d", ARTICLE_PAGE, "https://t.test/d", cfg)
        # Without scoring, the nav links remain (full-body serialization).
        assert "The Real Story" in res.markdown
        assert "[Home](https://t.test/)" in res.markdown


class TestC11LastResort:
    def test_scoring_rescues_selector_deleted_content(self):
        # All content inside <div class="menu"> (a nav selector): the C3 pass
        # deletes it, the relaxed re-clean (C11) restores it — and for a page
        # whose relaxed body is STILL mostly empty except a scored container,
        # the scoring arm picks that container.
        html = (
            '<html><body><div class="menu"><article>'
            + "<p>Buried article text. {}</p>".format("Prose. " * 40)
            + "</article></div></body></html>"
        )
        res = extract_document("d", html, "https://t.test/d")
        assert res.ok
        assert "Buried article text." in res.markdown
