"""Byte-exact port of the reference postprocess contract
(/root/reference/tests/unit/postprocess.test.ts — 16 its)."""

from reader_spark.extract.postprocess import postprocess_markdown as pp


class TestSkipToContentRemoval:
    def test_removes_skip_to_content(self):
        assert pp("[Skip to Content](#main)\n\nHello world") == "Hello world"

    def test_removes_jump_to_content(self):
        assert pp("[Jump to Content](#content)\n\nHello world") == "Hello world"

    def test_case_insensitive(self):
        assert pp("[skip to content](#nav)\n\nHello world") == "Hello world"

    def test_removes_skip_to_main_content(self):
        assert pp("[Skip to main Content](#main-content)\n\nBody text") == "Body text"

    def test_removes_uppercase(self):
        assert pp("[JUMP TO MAIN CONTENT](#top)\n\nBody text") == "Body text"

    def test_various_fragment_anchors(self):
        assert pp("[Skip to Content](#skip-nav)\n\nContent here") == "Content here"

    def test_keeps_real_url_links(self):
        s = "[Skip to Content](https://example.com/content)\n\nHello"
        assert pp(s) == s


class TestImageLinkDedup:
    def test_dedups_matching_urls(self):
        assert (
            pp("[![alt text](https://img.com/photo.jpg)](https://img.com/photo.jpg)")
            == "![alt text](https://img.com/photo.jpg)"
        )

    def test_keeps_differing_urls(self):
        s = "[![alt text](https://img.com/photo.jpg)](https://example.com/page)"
        assert pp(s) == s

    def test_dedups_multiple(self):
        inp = "\n\n".join(
            [
                "[![a](https://x.com/1.png)](https://x.com/1.png)",
                "[![b](https://x.com/2.png)](https://x.com/2.png)",
            ]
        )
        expected = "\n\n".join(
            ["![a](https://x.com/1.png)", "![b](https://x.com/2.png)"]
        )
        assert pp(inp) == expected


class TestBlankLineCollapsing:
    def test_collapse_three(self):
        assert pp("Hello\n\n\nWorld") == "Hello\n\nWorld"

    def test_collapse_five(self):
        assert pp("Hello\n\n\n\n\nWorld") == "Hello\n\nWorld"

    def test_keeps_two(self):
        assert pp("Hello\n\nWorld") == "Hello\n\nWorld"


class TestTrimAndEdge:
    def test_trims(self):
        assert pp("   \n\nHello world\n\n   ") == "Hello world"

    def test_empty(self):
        assert pp("") == ""


class TestCombined:
    def test_all_transformations(self):
        inp = "\n".join(
            [
                "  ",
                "[Skip to Content](#main)",
                "",
                "",
                "",
                "",
                "# Title",
                "",
                "[![hero](https://img.com/hero.jpg)](https://img.com/hero.jpg)",
                "",
                "Some content here.",
                "",
                "",
                "",
                "Footer text",
                "  ",
            ]
        )
        expected = "\n".join(
            [
                "# Title",
                "",
                "![hero](https://img.com/hero.jpg)",
                "",
                "Some content here.",
                "",
                "Footer text",
            ]
        )
        assert pp(inp) == expected
