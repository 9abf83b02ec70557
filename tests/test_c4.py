"""C4 §2.2 page/line quality cleaning (reader_spark.ops.c4)."""

import hashlib

from pyspark.sql import Row

from reader_spark.ops.c4 import c4_clean_lines, c4_line_flags, c4_page_clean
from reader_spark.ops.lines import chunk_lines


def _lines(spark, rows):
    """rows: (doc_id, line_no, line)."""
    return spark.createDataFrame(
        [Row(doc_id=d, line_no=n, line=t) for d, n, t in rows]
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


GOOD = "alpha beta gamma delta epsilon."  # 5 words, terminal punct


class TestLineRules:
    def test_terminal_punctuation_required(self, spark):
        df = _lines(
            spark,
            [
                (1, 0, GOOD),
                (1, 1, "alpha beta gamma delta epsilon"),  # no punct
                (1, 2, 'alpha beta gamma delta "quoted."'),  # quote ok? ends .
                (1, 3, 'alpha beta gamma delta "epsilon"'),  # ends with "
            ],
        )
        got = {
            r.line_no: r.line_keep for r in c4_line_flags(df).collect()
        }
        assert got == {0: True, 1: False, 2: True, 3: True}

    def test_min_words(self, spark):
        df = _lines(spark, [(1, 0, "one two three four."), (1, 1, GOOD)])
        got = {r.line_no: r.line_keep for r in c4_line_flags(df).collect()}
        assert got == {0: False, 1: True}  # 4 words < 5

    def test_javascript_line_dropped_case_insensitive(self, spark):
        df = _lines(
            spark,
            [
                (1, 0, "please enable JavaScript to view this."),
                (1, 1, "the javascripted word is different here."),  # not \b match
                (1, 2, GOOD),
            ],
        )
        got = {r.line_no: r.line_keep for r in c4_line_flags(df).collect()}
        assert got[0] is False
        # 'javascripted' does not word-bound-match 'javascript'
        assert got[1] is True
        assert got[2] is True

    def test_sentence_marks_counted_only_when_kept(self, spark):
        df = _lines(
            spark,
            [
                (1, 0, "one two. three four. five six."),  # kept, 3 marks
                (1, 1, "short."),  # dropped (1 word)
            ],
        )
        got = {
            r.line_no: r.n_sentence_marks for r in c4_line_flags(df).collect()
        }
        assert got == {0: 3, 1: 0}


class TestPageGates:
    def test_badword_gate_and_precedence(self, spark):
        # page has badword AND lorem ipsum AND {: badword reason wins
        df = _lines(
            spark,
            [
                (1, 0, GOOD),
                (1, 1, "this page has a BADWORD in it."),
                (1, 2, "lorem ipsum dolor sit amet here."),
                (1, 3, "code { block } here on page."),
            ],
        )
        row = c4_page_clean(df, badwords=("badword",)).collect()[0]
        assert row.page_kept == 0
        assert row.drop_reason == "badword"

    def test_lorem_then_curly(self, spark):
        df = _lines(
            spark,
            [(1, 0, "lorem ipsum text."), (1, 1, "x { y"), (1, 2, GOOD)],
        )
        assert (
            c4_page_clean(df).collect()[0].drop_reason == "lorem_ipsum"
        )
        df2 = _lines(spark, [(1, 0, "x { y"), (1, 1, GOOD)])
        assert c4_page_clean(df2).collect()[0].drop_reason == "curly_brace"

    def test_gates_scan_dropped_lines_too(self, spark):
        # the '{' sits on a line that FAILS the line rules; the page
        # gate must still see it (C4 evaluates gates on raw page text)
        df = _lines(spark, [(1, 0, "x {"), (1, 1, GOOD), (1, 2, GOOD), (1, 3, GOOD)])
        assert c4_page_clean(df).collect()[0].drop_reason == "curly_brace"

    def test_too_few_sentences(self, spark):
        df = _lines(spark, [(1, 0, GOOD), (1, 1, GOOD)])  # 2 sentences < 3
        row = c4_page_clean(df).collect()[0]
        assert row.drop_reason == "too_few_sentences"
        assert row.n_sentences == 2

    def test_admitted_page(self, spark):
        df = _lines(spark, [(1, i, GOOD) for i in range(3)])
        row = c4_page_clean(df).collect()[0]
        assert row.page_kept == 1
        assert row.drop_reason is None
        assert row.n_lines == 3
        assert row.n_kept_lines == 3
        assert row.clean_md5 == _md5(" ".join([GOOD] * 3))

    def test_empty_survivor_hashes_empty_string(self, spark):
        df = _lines(spark, [(1, 0, "no punct at all")])
        row = c4_page_clean(df).collect()[0]
        assert row.n_kept_lines == 0
        assert row.clean_md5 == _md5("")

    def test_reassembly_preserves_order(self, spark):
        a, b = "first kept line goes here.", "second kept line goes here."
        df = _lines(
            spark,
            [(1, 1, b), (1, 0, a), (1, 2, GOOD)],  # shuffled input order
        )
        row = c4_page_clean(df).collect()[0]
        assert row.clean_md5 == _md5(" ".join([a, b, GOOD]))


class TestCleanLines:
    def test_applied_pass_drops_gated_pages_and_bad_lines(self, spark):
        df = _lines(
            spark,
            [
                (1, 0, GOOD),
                (1, 1, "nope"),
                (1, 2, GOOD),
                (1, 3, GOOD),
                (2, 0, "lorem ipsum dolor."),
                (2, 1, GOOD),
            ],
        )
        got = {
            (r.doc_id, r.line_no) for r in c4_clean_lines(df).collect()
        }
        # doc 2 gated out entirely; doc 1 loses only line 1
        assert got == {(1, 0), (1, 2), (1, 3)}

    def test_composes_with_chunk_lines(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="a b c d e. f g h i j. k l m n o.")]
        )
        lines = chunk_lines(docs, words_per_line=5)
        out = c4_clean_lines(lines).collect()
        assert len(out) == 3
