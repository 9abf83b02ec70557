"""Block detection parity battery — mirrors the reference's
tests/unit/block-detector.test.ts contracts (config-driven signal counting,
short/long thresholds, title patterns, HTTP status codes)."""

from reader_spark.functions.text import (
    detect_bot_page,
    detect_bot_title,
    is_blocked_status,
)

CFG = (
    r"click the button below",
    r"automated access",
    r"checking your browser",
    r"enable javascript",
    r"unusual traffic",
    r"are you a robot",
)
TITLES = (r"robot check", r"access denied", r"just a moment")


class TestDetectBotPage:
    def test_no_config_unopinionated(self):
        html = "<html><body>Robot check! Click the button below.</body></html>"
        assert detect_bot_page(html, ()) is False

    def test_amazon_click_button(self):
        html = "<html><body><p>Click the button below to continue shopping.</p></body></html>"
        assert detect_bot_page(html, CFG) is True  # short page, 1 signal

    def test_amazon_automated_access(self):
        html = "<html><body>To discuss automated access to Amazon data please contact us.</body></html>"
        assert detect_bot_page(html, CFG) is True

    def test_cloudflare_challenge(self):
        html = (
            "<html><body>Checking your browser before accessing the site. "
            "Please enable JavaScript and wait. Are you a robot?</body></html>"
        )
        assert detect_bot_page(html, CFG) is True

    def test_normal_article_not_flagged(self):
        body = "word " * 200 + "This is a perfectly normal news article about economics."
        assert detect_bot_page(f"<html><body>{body}</body></html>", CFG) is False

    def test_article_about_bots_needs_three_signals(self):
        # block-detector.test.ts: LONG content requires >=3 signals — an
        # article that merely mentions two phrases must not be flagged.
        filler = "word " * 200
        body = (
            filler
            + "The site asked me to click the button below, citing automated access."
        )
        html = f"<html><body>{body}</body></html>"
        assert len(body) > 500
        assert detect_bot_page(html, CFG) is False
        # ...but three distinct signals DO flag a long page
        body3 = body + " It was checking your browser the whole time."
        assert detect_bot_page(f"<html><body>{body3}</body></html>", CFG) is True

    def test_empty_and_whitespace_html(self):
        assert detect_bot_page("", CFG) is False
        assert detect_bot_page("   \n  ", CFG) is False

    def test_invalid_pattern_skipped(self):
        assert detect_bot_page("<p>short block page</p>", (r"[invalid", r"block")) is True


class TestDetectBotTitle:
    def test_no_config(self):
        assert detect_bot_title("Robot Check", ()) is False

    def test_robot_check(self):
        assert detect_bot_title("Robot Check", TITLES) is True

    def test_access_denied(self):
        assert detect_bot_title("Access Denied | example.com", TITLES) is True

    def test_normal_title(self):
        assert detect_bot_title("Quarterly earnings beat expectations", TITLES) is False

    def test_empty_title(self):
        assert detect_bot_title("", TITLES) is False


class TestBlockedStatus:
    def test_hard_codes_always_block(self):
        for code, reason in ((401, "unauthorized"), (403, "forbidden"),
                             (429, "rate_limited"), (503, "service_unavailable")):
            assert is_blocked_status(code) == (True, reason)

    def test_ok_and_redirects_allowed(self):
        for code in (200, 201, 301, 302, 404, 500):
            assert is_blocked_status(code)[0] is False


class TestFrameworkErrorPage:
    # playwright/index.ts:240-252 (U11) — all four rules, both forms.
    CASES = [
        ("<html>Application error: a client-side exception has occurred</html>", True),
        ("<div>There was an error while hydrating.</div>", True),
        ('<div id="__nuxt"><div class="nuxt-error">500</div></div>', True),
        ("<div>error boundary caught failed chunk load</div>", True),
        # react rule suppressed when a real <article> survived
        ("<article>x</article> error boundary chunk", False),
        ("<html><body>A normal page about nuxt tutorials</body></html>", False),
        ("", False),
    ]

    def test_pure(self):
        from reader_spark.functions.text import is_framework_error_page

        for html, want in self.CASES:
            assert is_framework_error_page(html) is want, html

    def test_column_twin_matches_pure(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from reader_spark.functions.text import framework_error_col

        df = spark.createDataFrame(
            [(i, h) for i, (h, _w) in enumerate(self.CASES)], "i long, html string"
        )
        got = {
            r["i"]: r["blocked"]
            for r in df.select("i", framework_error_col(F.col("html")).alias("blocked")).collect()
        }
        for i, (_h, want) in enumerate(self.CASES):
            assert got[i] is want
