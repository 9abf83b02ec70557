"""BM25 ranking: scores match a plain-Python reference, ranking behaves
(tf raises, doc length normalizes), degenerate inputs, and the top-k plan
shape (TakeOrderedAndProject, no global sort)."""

import math

import pytest

from reader_spark.ops.search import bm25_rank

pytestmark = pytest.mark.spark

K1, B = 1.2, 0.75


def py_bm25(corpus, terms, k1=K1, b=B):
    """Reference scorer over {doc_id: text}, same normalization."""
    toks = {d: t.lower().split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, words in toks.items():
        dl = len(words)
        s = 0.0
        for t in terms:
            tf = words.count(t)
            df = sum(1 for w in toks.values() if t in w)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 9)
        if round(s, 6) > 0:
            out[d] = round(s, 6)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    data = {
        1: "spark streams data and spark shuffles data",
        2: "spark once in a much much much longer document about other things entirely",
        3: "nothing relevant here at all",
        4: "spark spark spark",
    }
    return data, spark.createDataFrame(
        list(data.items()), "doc_id long, text string"
    )


def test_scores_match_python_reference(corpus):
    data, df = corpus
    got = {r["doc_id"]: r["score"] for r in
           bm25_rank(df, ["spark", "data"], top_k=10).collect()}
    assert got == pytest.approx(py_bm25(data, ["spark", "data"]))


def test_ranking_behaviour(corpus):
    data, df = corpus
    ranked = [r["doc_id"] for r in bm25_rank(df, ["spark"], top_k=10).collect()]
    assert ranked[0] == 4          # highest tf, shortest doc
    assert 3 not in ranked         # zero-score docs are dropped
    assert ranked.index(1) < ranked.index(2)  # length normalization


def test_absent_term_contributes_nothing(corpus):
    data, df = corpus
    with_ghost = {r["doc_id"]: r["score"] for r in
                  bm25_rank(df, ["spark", "zzznotaword"], top_k=10).collect()}
    alone = {r["doc_id"]: r["score"] for r in
             bm25_rank(df, ["spark"], top_k=10).collect()}
    assert with_ghost == alone


def test_no_match_returns_empty(corpus):
    _, df = corpus
    assert bm25_rank(df, ["zzznotaword"], top_k=10).count() == 0


def test_bad_args_rejected(corpus):
    _, df = corpus
    with pytest.raises(ValueError):
        bm25_rank(df, [])
    with pytest.raises(ValueError):
        bm25_rank(df, ["Upper"])
    with pytest.raises(ValueError):
        bm25_rank(df, ["two words"])


def test_topk_plan_no_global_sort(corpus):
    from tests.test_plans import plan_of

    _, df = corpus
    plan = plan_of(bm25_rank(df, ["spark"], top_k=5))
    assert "TakeOrderedAndProject" in plan  # per-partition heap, not a Sort
    assert "Exchange rangepartitioning" not in plan


class TestHybridRRF:
    def test_fusion_math_consistent(self, spark):
        import __spark_entry__ as entry

        rows = entry.queries()["hybrid_search_rrf"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows
        for r in rows:
            expect = 0.0
            if r.bm25_rank is not None:
                assert 1 <= r.bm25_rank <= 15
                expect += 1.0 / (60 + r.bm25_rank)
            if r.cos_rank is not None:
                assert 1 <= r.cos_rank <= 15
                expect += 1.0 / (60 + r.cos_rank)
            assert r.bm25_rank is not None or r.cos_rank is not None
            assert r.rrf == round(expect, 6)

    def test_doc_in_both_legs_outranks_single_leg_peer(self, spark):
        """A doc appearing in BOTH rankings must beat a doc whose single
        rank is no better than either of its ranks."""
        import __spark_entry__ as entry

        rows = entry.queries()["hybrid_search_rrf"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        both = [r for r in rows if r.bm25_rank is not None and r.cos_rank is not None]
        for b in both:
            for s in rows:
                if s.bm25_rank is None and s.cos_rank is not None and s.cos_rank >= b.cos_rank:
                    assert b.rrf > s.rrf
