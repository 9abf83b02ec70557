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


class TestBoilerplateSpans:
    SCHEMA = (
        "doc_id string, domain string, spans array<struct<kind:string,"
        "text:string,media_ref:string,order:int>>"
    )

    def _docs(self, spark):
        nav = "Home About Contact"
        rows = [
            ("a1", "a.com", [("text", nav, None, 0), ("text", "alpha", None, 1),
                             ("image", None, "img://1", 2)]),
            ("a2", "a.com", [("text", nav, None, 0), ("text", "beta", None, 1)]),
            ("a3", "a.com", [("code", nav, None, 0), ("text", "gamma", None, 1)]),
            # same nav text on b.com but only 1 of its 3 docs -> below 0.5
            ("b1", "b.com", [("text", nav, None, 0), ("text", "delta", None, 1)]),
            ("b2", "b.com", [("text", "epsilon", None, 0)]),
            ("b3", "b.com", None),
        ]
        return spark.createDataFrame(rows, self.SCHEMA)

    def test_detects_per_domain_threshold(self, spark):
        from reader_spark.ops.lines import boilerplate_spans

        got = {
            (r.domain, r.text): (r.n_docs, r.doc_frac)
            for r in boilerplate_spans(
                self._docs(spark), domain_col="domain", min_frac=0.5
            ).collect()
        }
        # nav is prose in 2/3 a.com docs (the code span doesn't count)
        assert got == {("a.com", "Home About Contact"): (2, 0.666667)}

    def test_strip_keeps_media_redensifies_and_restores_docs(self, spark):
        from reader_spark.ops.lines import (
            boilerplate_spans,
            strip_boilerplate_spans,
        )

        docs = self._docs(spark)
        boiler = boilerplate_spans(docs, domain_col="domain", min_frac=0.5)
        out = {
            r.doc_id: r.spans
            for r in strip_boilerplate_spans(
                docs, boiler, domain_col="domain"
            ).collect()
        }
        assert len(out) == 6  # no doc silently dropped
        a1 = out["a1"]
        assert [(s.kind, s.text, s.media_ref, s.order) for s in a1] == [
            ("text", "alpha", None, 0),
            ("image", None, "img://1", 1),
        ]
        # code span survives even though its text is on the deletion list
        assert [(s.kind, s.order) for s in out["a3"]] == [
            ("code", 0), ("text", 1)
        ]
        # b.com nav below threshold -> untouched
        assert [s.text for s in out["b1"]] == ["Home About Contact", "delta"]
        assert out["b3"] == []  # NULL spans come back as empty, not lost

    def test_all_spans_deleted_yields_empty_array(self, spark):
        from reader_spark.ops.lines import strip_boilerplate_spans

        docs = spark.createDataFrame(
            [("d1", "x.com", [("text", "nav", None, 0)])], self.SCHEMA
        )
        boiler = spark.createDataFrame(
            [("x.com", "nav", 1, 1.0)], "domain string, text string, n_docs long, doc_frac double"
        )
        got = strip_boilerplate_spans(docs, boiler, domain_col="domain").collect()
        assert got[0].spans == []

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.lines import boilerplate_spans

        df = self._docs(spark)
        with _pytest.raises(ValueError, match="min_frac"):
            boilerplate_spans(df, domain_col="domain", min_frac=0.0)


class TestSentenceSpansDedup:
    def test_punctuation_sentences_and_window_overlap(self, spark):
        from reader_spark.ops.lines import sentence_spans_dedup

        # docs 1 and 2 share the sentence run (A. B! C?); doc 3 shares
        # only two of the three sentences -> no common 3-window with it.
        df = _docs(
            spark,
            [
                (1, "Alpha one. Beta two! Gamma three? Tail four."),
                (2, "Intro zero. Alpha one. Beta two! Gamma three?"),
                (3, "Alpha one. Beta two! Different end."),
            ],
        )
        rows = sentence_spans_dedup(df, n=3).collect()
        assert len(rows) == 1
        (r,) = rows
        assert (r.n_occ, r.n_docs, r.first_doc) == (2, 2, 1)

    def test_within_doc_repetition_counts_occurrences(self, spark):
        from reader_spark.ops.lines import sentence_spans_dedup

        # the same 3-sentence span twice INSIDE one doc: n_occ counts
        # occurrences (2), n_docs distinct docs (1).
        df = _docs(spark, [(7, "A one. B two. C three. A one. B two. C three.")])
        rows = sentence_spans_dedup(df, n=3).collect()
        by_occ = {(r.n_occ, r.n_docs) for r in rows}
        assert (2, 1) in by_occ

    def test_token_chunk_pattern_mode(self, spark):
        from reader_spark.ops.lines import sentence_spans_dedup

        # punctuation-free corpus: 2-token chunks, 2-chunk windows.
        # "a b c d" -> chunks [a b, c d] -> one window "a b\nc d",
        # shared by both docs.
        df = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
        rows = sentence_spans_dedup(
            df, n=2, pattern=r"\S+( \S+){0,1}"
        ).collect()
        assert len(rows) == 1 and rows[0].n_occ == 2

    def test_unique_spans_not_reported(self, spark):
        from reader_spark.ops.lines import sentence_spans_dedup

        df = _docs(spark, [(1, "A one. B two. C three."), (2, "X. Y. Z.")])
        assert sentence_spans_dedup(df, n=3).count() == 0

    def test_invalid_n_raises(self, spark):
        from reader_spark.ops.lines import sentence_spans_dedup

        with pytest.raises(ValueError):
            sentence_spans_dedup(_docs(spark, [(1, "a.")]), n=0)


class TestSentenceSpansApply:
    def _run(self, spark, rows, **kw):
        from reader_spark.ops.lines import sentence_spans_apply

        out = sentence_spans_apply(_docs(spark, rows), **kw).collect()
        return {r.doc_id: (r.n_sents, r.n_kept, r.n_dropped) for r in out}

    def test_first_occurrence_kept_later_removed(self, spark):
        # docs 1 and 2 share the 3-sentence run; doc 1 is the global
        # first (same start index, lower doc_id) so it keeps everything
        # and doc 2 loses exactly the 3 covered sentences.
        got = self._run(
            spark,
            [
                (1, "Alpha one. Beta two! Gamma three? Tail four."),
                (2, "Alpha one. Beta two! Gamma three? Other end."),
            ],
        )
        assert got == {1: (4, 4, 0), 2: (4, 1, 3)}

    def test_overlapping_windows_union_coverage(self, spark):
        # doc 1 = A B C D; doc 2 = A B C D E. Windows ABC and BCD are
        # duplicated; doc 2's removals must union to {A,B,C,D}, not
        # double-delete, and E survives.
        got = self._run(
            spark,
            [
                (1, "A one. B two. C three. D four."),
                (2, "A one. B two. C three. D four. E five."),
            ],
        )
        assert got == {1: (4, 4, 0), 2: (5, 1, 4)}

    def test_within_doc_repeat_keeps_earliest_start(self, spark):
        # the duplicated span's two occurrences are inside ONE doc:
        # min(struct(doc, start)) elects the first start; the second
        # occurrence's 3 sentences drop.
        got = self._run(
            spark, [(7, "A one. B two. C three. A one. B two. C three.")]
        )
        assert got == {7: (6, 3, 3)}

    def test_docs_without_duplicates_untouched(self, spark):
        got = self._run(
            spark,
            [(1, "A one. B two. C three."), (2, "X. Y. Z."), (3, "Short.")],
        )
        assert got == {1: (3, 3, 0), 2: (3, 3, 0), 3: (1, 1, 0)}

    def test_out_md5_matches_reassembled_text(self, spark):
        import hashlib

        from reader_spark.ops.lines import sentence_spans_apply

        df = _docs(
            spark,
            [
                (1, "Alpha one. Beta two! Gamma three? Tail four."),
                (2, "Alpha one. Beta two! Gamma three? Other end."),
            ],
        )
        rows = {r.doc_id: r.out_md5 for r in sentence_spans_apply(df).collect()}
        full = "Alpha one. Beta two! Gamma three? Tail four."
        assert rows[1] == hashlib.md5(full.encode()).hexdigest()
        assert rows[2] == hashlib.md5(b"Other end.").hexdigest()

    def test_invalid_n_raises(self, spark):
        from reader_spark.ops.lines import sentence_spans_apply

        with pytest.raises(ValueError):
            sentence_spans_apply(_docs(spark, [(1, "a.")]), n=0)
