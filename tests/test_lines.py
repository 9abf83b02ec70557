"""C4-style global line dedup (reader_spark.ops.lines)."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.lines import chunk_lines, line_dedup, line_dedup_summary


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


class TestChunkLines:
    def test_fixed_width_chunking(self, spark):
        df = _docs(spark, [(1, "a b c d e f g")])
        got = {
            (r.line_no, r.line)
            for r in chunk_lines(df, words_per_line=3).collect()
        }
        assert got == {(0, "a b c"), (1, "d e f"), (2, "g")}

    def test_newline_mode(self, spark):
        df = _docs(spark, [(1, "first line\nsecond line\n")])
        got = [
            (r.line_no, r.line)
            for r in chunk_lines(df, words_per_line=None)
            .orderBy("line_no")
            .collect()
        ]
        assert got == [(0, "first line"), (1, "second line"), (2, "")]

    def test_invalid_width_raises(self, spark):
        df = _docs(spark, [(1, "a b")])
        with pytest.raises(ValueError):
            chunk_lines(df, words_per_line=0)


class TestLineDedup:
    def test_first_occurrence_survives(self, spark):
        # same 2-word line in three docs; doc 1's copy (lowest doc_id) wins
        df = _docs(spark, [(3, "dup line"), (1, "dup line"), (2, "dup line")])
        lines = chunk_lines(df, words_per_line=2)
        kept = line_dedup(lines, min_words=2).collect()
        assert [(r.doc_id, r.line) for r in kept] == [(1, "dup line")]

    def test_within_doc_duplicates_also_drop(self, spark):
        df = _docs(spark, [(1, "x y x y")])
        lines = chunk_lines(df, words_per_line=2)
        kept = line_dedup(lines, min_words=2).collect()
        assert [(r.line_no, r.line) for r in kept] == [(0, "x y")]

    def test_short_lines_exempt(self, spark):
        # 1-word trailing chunks repeat across docs but are never deduped
        df = _docs(spark, [(1, "a b c"), (2, "d e c")])
        lines = chunk_lines(df, words_per_line=2)
        kept = line_dedup(lines, min_words=2).collect()
        assert sorted((r.doc_id, r.line) for r in kept) == [
            (1, "a b"),
            (1, "c"),
            (2, "c"),
            (2, "d e"),
        ]


class TestSummary:
    def test_counts_and_total_loss(self, spark):
        # doc 2 is a verbatim repeat of doc 1 and loses every line
        df = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
        rows = {
            r.doc_id: r
            for r in line_dedup_summary(
                df, words_per_line=2, min_words=2
            ).collect()
        }
        assert (rows[1].n_lines, rows[1].n_kept, rows[1].n_dropped) == (2, 2, 0)
        assert (rows[2].n_lines, rows[2].n_kept, rows[2].n_dropped) == (2, 0, 2)
        # empty reassembly hashes the empty string, not NULL
        import hashlib

        assert rows[2].dedup_md5 == hashlib.md5(b"").hexdigest()
        assert rows[1].dedup_md5 == hashlib.md5(b"a b c d").hexdigest()

    def test_deterministic(self, spark):
        df = _docs(
            spark,
            [(i, " ".join(chr(97 + (i * j) % 7) for j in range(9))) for i in range(40)],
        )
        a = sorted(map(tuple, line_dedup_summary(df).collect()))
        b = sorted(map(tuple, line_dedup_summary(df).collect()))
        assert a == b
