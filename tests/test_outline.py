"""Document outline edges (reader_spark.ops.outline)."""

from pyspark.sql import Row

from reader_spark.ops.outline import outline_edges


def _spans(spark, rows):
    """rows: (doc_id, ord, text)."""
    return spark.createDataFrame(
        [Row(doc_id=d, ord=o, text=t) for d, o, t in rows]
    )


class TestOutlineEdges:
    def test_nested_hierarchy(self, spark):
        rows = [
            (1, 0, "# Title"),
            (1, 1, "body text, not a heading"),
            (1, 2, "## A"),
            (1, 3, "### A.1"),
            (1, 4, "## B"),
            (1, 5, "### B.1"),
            (1, 6, "#### B.1.a"),
        ]
        got = {
            r.ord: (r.level, r.title, r.parent_ord)
            for r in outline_edges(_spans(spark, rows)).collect()
        }
        assert got == {
            0: (1, "Title", None),
            2: (2, "A", 0),
            3: (3, "A.1", 2),
            4: (2, "B", 0),
            5: (3, "B.1", 4),
            6: (4, "B.1.a", 5),
        }

    def test_level_skip_parent_is_nearest_shallower(self, spark):
        # h1 then h4: the h4's parent is the h1 (levels 2/3 absent)
        rows = [(1, 0, "# Top"), (1, 1, "#### Deep")]
        got = {r.ord: r.parent_ord for r in outline_edges(_spans(spark, rows)).collect()}
        assert got == {0: None, 1: 0}

    def test_orphan_subheading_has_no_parent(self, spark):
        # page starts at h3 with no shallower heading anywhere
        rows = [(1, 0, "### Lone"), (1, 1, "## Later")]
        got = {r.ord: r.parent_ord for r in outline_edges(_spans(spark, rows)).collect()}
        assert got[0] is None
        assert got[1] is None  # h2 has no h1 before it

    def test_stale_deeper_heading_not_parent(self, spark):
        # h3, then h2, then h3: second h3's parent is the h2, and a new
        # h2 section does NOT inherit the old h3
        rows = [(1, 0, "### Old"), (1, 1, "## Sec"), (1, 2, "### New")]
        got = {r.ord: r.parent_ord for r in outline_edges(_spans(spark, rows)).collect()}
        assert got[2] == 1

    def test_non_heading_rows_ignored(self, spark):
        rows = [(1, 0, "#hashtag no space"), (1, 1, "# Real")]
        got = outline_edges(_spans(spark, rows)).collect()
        assert len(got) == 1
        assert got[0].title == "Real"

    def test_docs_isolated(self, spark):
        rows = [(1, 0, "# One"), (2, 0, "## Two")]
        got = {
            (r.doc_id, r.ord): r.parent_ord
            for r in outline_edges(_spans(spark, rows)).collect()
        }
        assert got[(2, 0)] is None  # doc 1's h1 is not doc 2's parent


class TestSectionOfSpans:
    def test_labels_and_front_matter(self, spark):
        from reader_spark.ops.outline import section_of_spans

        rows = [
            (1, 0, "front matter before any heading"),
            (1, 1, "# Intro"),
            (1, 2, "intro body"),
            (1, 3, "## Details"),
            (1, 4, "details body"),
            (1, 5, "more details"),
        ]
        got = {
            r.ord: (r.section_ord, r.section_title)
            for r in section_of_spans(_spans(spark, rows)).collect()
        }
        assert got == {
            0: (None, None),
            2: (1, "Intro"),
            4: (3, "Details"),
            5: (3, "Details"),
        }

    def test_heading_rows_excluded_from_output(self, spark):
        from reader_spark.ops.outline import section_of_spans

        rows = [(1, 0, "# H"), (1, 1, "body")]
        got = section_of_spans(_spans(spark, rows)).collect()
        assert [r.ord for r in got] == [1]
