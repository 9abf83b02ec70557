"""Robots parser (reference tests/unit/robots-parser.test.ts behaviors) and
link extraction / crawl admission (crawler.ts extractLinks, shouldCrawlUrl)."""

from reader_spark.functions.links import (
    admit_link,
    extract_links,
    should_crawl_url,
)
from reader_spark.functions.robots import (
    RobotsRules,
    is_path_allowed,
    is_url_allowed,
    parse_robots_txt,
    path_matches,
)


class TestParseRobots:
    CONTENT = """
# comment line
User-agent: *
Disallow: /private/
Allow: /private/public-bit
Crawl-delay: 2

User-agent: special-bot
Disallow: /only-for-special
"""

    def test_wildcard_group(self):
        rules = parse_robots_txt(self.CONTENT)
        assert rules.disallowed_paths == ["/private/"]
        assert rules.allowed_paths == ["/private/public-bit"]
        assert rules.crawl_delay_ms == 2000

    def test_specific_agent_gets_both_groups(self):
        rules = parse_robots_txt(self.CONTENT, "special-bot")
        assert "/only-for-special" in rules.disallowed_paths
        assert "/private/" in rules.disallowed_paths  # '*' group also matches

    def test_empty_content(self):
        rules = parse_robots_txt("")
        assert rules.disallowed_paths == [] and rules.allowed_paths == []


class TestPathMatching:
    def test_prefix_match(self):
        assert path_matches("/private/page", "/private/")

    def test_wildcard(self):
        assert path_matches("/a/anything/b", "/a/*/b")
        assert not path_matches("/a/b", "/a/*/c")

    def test_end_anchor(self):
        assert path_matches("/file.pdf", "*.pdf$")
        assert not path_matches("/file.pdf?x=1", "*.pdf$")

    def test_empty_pattern_matches_nothing(self):
        assert not path_matches("/anything", "")


class TestAllowPrecedence:
    RULES = RobotsRules(
        disallowed_paths=["/private/"], allowed_paths=["/private/open"]
    )

    def test_allow_first(self):
        assert is_path_allowed("/private/open/page", self.RULES)

    def test_disallow(self):
        assert not is_path_allowed("/private/secret", self.RULES)

    def test_default_allowed(self):
        assert is_path_allowed("/public", self.RULES)

    def test_none_rules_allow_all(self):
        assert is_url_allowed("https://a.com/anything", None)

    def test_url_form(self):
        assert not is_url_allowed("https://a.com/private/secret", self.RULES)


class TestExtractLinks:
    HTML = """
    <html><body>
      <a href="/page-a">A</a>
      <a href="https://same.test/page-b#frag">B</a>
      <a href="#fragment-only">skip</a>
      <a href="javascript:void(0)">skip</a>
      <a href="mailto:x@y.z">skip</a>
      <a href="ftp://files.test/f">skip</a>
      <a href="/page-a">dup</a>
    </body></html>
    """

    def test_extraction(self):
        links = extract_links(self.HTML, "https://same.test/start")
        assert links == [
            "https://same.test/page-a",
            "https://same.test/page-b",
        ]


class TestShouldCrawl:
    def test_depth_limit(self):
        assert not should_crawl_url(
            "https://a.com/x/y", "https://a.com", max_depth=1, current_depth=2, visited=set()
        )

    def test_visited(self):
        from reader_spark.functions.urls import get_url_key

        url = "https://a.com/x/y"
        assert not should_crawl_url(
            url, "https://a.com", 2, 1, visited={get_url_key(url)}
        )

    def test_cross_domain(self):
        assert not should_crawl_url("https://b.com/x/y", "https://a.com", 2, 1, set())

    def test_extension_substring_semantics(self):
        # Reference checks `includes`, not endswith — ported bug-compatibly.
        assert not should_crawl_url(
            "https://a.com/files.pdf/page", "https://a.com", 2, 1, set()
        )

    def test_skip_patterns(self):
        assert not should_crawl_url(
            "https://a.com/admin/settings/x", "https://a.com", 2, 1, set()
        )

    def test_query_blacklist(self):
        assert not should_crawl_url(
            "https://a.com/a/b?download=1", "https://a.com", 2, 1, set()
        )

    def test_accepts_article(self):
        assert should_crawl_url(
            "https://a.com/blog/how-to", "https://a.com", 2, 1, set()
        )


class TestAdmitLink:
    def test_chain(self):
        assert admit_link("https://a.com/blog/x", "https://a.com/start")
        assert not admit_link("https://b.com/blog/x", "https://a.com/start")
        assert not admit_link("https://a.com/privacy-policy", "https://a.com/start")
        assert not admit_link(
            "https://a.com/blog/x", "https://a.com/start", exclude_patterns=[r"/blog/"]
        )


class TestReferenceRobotsParity:
    """Full assertion set from tests/unit/robots-parser.test.ts."""

    def test_fractional_crawl_delay(self):
        assert parse_robots_txt("User-agent: *\nCrawl-delay: 0.5").crawl_delay_ms == 500

    def test_non_numeric_crawl_delay(self):
        assert parse_robots_txt("User-agent: *\nCrawl-delay: fast").crawl_delay_ms is None

    def test_case_insensitive_agent(self):
        r = parse_robots_txt("User-agent: GoogleBot\nDisallow: /blocked", "googlebot")
        assert r.disallowed_paths == ["/blocked"]

    def test_no_colon_lines_ignored(self):
        r = parse_robots_txt("User-agent: *\nno colon line here\nDisallow: /private")
        assert r.disallowed_paths == ["/private"]

    def test_empty_disallow_skipped(self):
        r = parse_robots_txt("User-agent: *\nDisallow:\nDisallow: /private")
        assert r.disallowed_paths == ["/private"]

    def test_wildcard_prefix(self):
        rules = RobotsRules(disallowed_paths=["/private*"])
        assert not is_path_allowed("/private/foo", rules)
        assert not is_path_allowed("/private/bar/baz", rules)

    def test_dollar_anchor_with_query(self):
        rules = RobotsRules(disallowed_paths=["/*.pdf$"])
        assert not is_path_allowed("/document.pdf", rules)
        assert is_path_allowed("/document.pdf?id=1", rules)

    def test_leading_slash_normalized(self):
        assert not is_path_allowed("private", RobotsRules(disallowed_paths=["/private"]))

    def test_mid_pattern_wildcard(self):
        rules = RobotsRules(disallowed_paths=["/api/*/internal"])
        assert not is_path_allowed("/api/v1/internal", rules)
        assert is_path_allowed("/api/v1/public", rules)
