"""Port of the markdown conversion contract
(/root/reference/tests/unit/markdown-formatter.test.ts — the de-facto spec
for M1, since the reference's Rust converter is not vendored)."""

from reader_spark.extract.markdown import format_to_markdown, html_to_markdown


def test_heading_atx():
    assert "# Hello World" in html_to_markdown("<h1>Hello World</h1>")


def test_paragraph_plain_text():
    result = html_to_markdown("<p>This is a paragraph.</p>")
    assert "This is a paragraph." in result
    assert "<p>" not in result


def test_links_inline():
    result = html_to_markdown('<p><a href="https://example.com">Click here</a></p>')
    assert "[Click here](https://example.com)" in result


def test_unordered_list_dash_marker():
    result = html_to_markdown("<ul><li>First</li><li>Second</li><li>Third</li></ul>")
    assert "- First" in result
    assert "- Second" in result
    assert "- Third" in result


def test_bold_and_italic():
    result = html_to_markdown("<p><strong>bold</strong> and <em>italic</em></p>")
    assert "**bold**" in result
    assert "*italic*" in result


def test_code_fence():
    result = html_to_markdown("<pre><code>const x = 1;</code></pre>")
    assert "`" in result
    assert "const x = 1;" in result


def test_empty_input():
    assert html_to_markdown("") == ""


def test_whitespace_only():
    assert html_to_markdown("   \n\t  ").strip() == ""


def test_table_gfm():
    result = html_to_markdown(
        "<table><thead><tr><th>Name</th><th>Age</th></tr></thead>"
        "<tbody><tr><td>Alice</td><td>30</td></tr></tbody></table>"
    )
    for token in ("Name", "Age", "Alice", "30", "|"):
        assert token in result


def test_image_syntax():
    result = html_to_markdown(
        '<img src="https://example.com/image.png" alt="A photo">'
    )
    assert "![A photo](https://example.com/image.png)" in result


def test_nested_structures():
    result = html_to_markdown(
        '<p>This has <strong>bold</strong>, <em>italic</em>, and '
        '<a href="https://example.com">a link</a>.</p>'
    )
    assert "**bold**" in result
    assert "*italic*" in result
    assert "[a link](https://example.com)" in result


def test_large_input_no_fallback():
    large = "<p>" + "Hello world. " * 20 + "</p>"
    result = html_to_markdown(large)
    assert "Hello world." in result
    assert len(result) > 0


def test_alias_same_function():
    assert format_to_markdown is html_to_markdown


def test_ordered_list():
    result = html_to_markdown("<ol><li>Alpha</li><li>Beta</li></ol>")
    assert "1. Alpha" in result
    assert "2. Beta" in result


def test_strikethrough_gfm():
    assert "~~gone~~" in html_to_markdown("<p><del>gone</del></p>")


def test_blockquote():
    assert "> quoted" in html_to_markdown("<blockquote>quoted</blockquote>")


def test_task_list_gfm():
    result = html_to_markdown(
        '<ul><li><input type="checkbox" checked>Done thing</li>'
        '<li><input type="checkbox">Todo thing</li></ul>'
    )
    assert "- [x] Done thing" in result
    assert "- [ ] Todo thing" in result


def test_autolink_gfm():
    result = html_to_markdown(
        '<p>See <a href="https://example.com/x">https://example.com/x</a></p>'
    )
    assert "<https://example.com/x>" in result


def test_nested_list_indent():
    result = html_to_markdown(
        "<ul><li>Top<ul><li>Nested A</li><li>Nested B</li></ul></li></ul>"
    )
    assert "- Top" in result
    assert "  - Nested A" in result
    assert "  - Nested B" in result


def test_entity_handling():
    result = html_to_markdown("<p>Fish &amp; chips &lt;tasty&gt;</p>")
    assert "Fish & chips <tasty>" in result
