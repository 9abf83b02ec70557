"""ROUGE-L near-dup detection (ops/rouge.py): Hunt-Szymanski LCS fold
vs a classic-DP Python reference, self-instruct dedup semantics, the
df candidate guard, and the no-cartesian plan shape."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.rouge import lcs_len, rouge_l_pairs

pytestmark = pytest.mark.spark


def _py_lcs(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[-1][-1]


CASES = [
    (["the", "cat", "sat", "on", "the", "mat"],
     ["the", "dog", "sat", "on", "a", "mat", "the"]),
    ([], ["x"]),
    (["x"], []),
    ([], []),
    (["a", "b", "c"], ["a", "b", "c"]),
    (["a", "a", "a", "a"], ["a", "a"]),
    (["a", "b", "a", "b"], ["b", "a", "b", "a"]),
    (["x", "y", "z"], ["p", "q", "r"]),
    (["r", "r", "s", "r", "t", "r"], ["r", "t", "r", "r", "s"]),
]


def test_lcs_matches_classic_dp(spark):
    df = spark.createDataFrame(
        [(a, b) for a, b in CASES], "a array<string>, b array<string>"
    )
    got = [
        r["l"]
        for r in df.select(
            lcs_len(F.col("a"), F.col("b")).alias("l")
        ).collect()
    ]
    assert got == [_py_lcs(a, b) for a, b in CASES]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # near-identical pair: one inserted word, order preserved
        Row(doc_id=1, text="please summarize the following article in two "
                           "sentences keeping all named entities intact"),
        Row(doc_id=2, text="summarize the following article in two "
                           "sentences keeping all the named entities intact"),
        # exact duplicate pair
        Row(doc_id=3, text="translate this paragraph into formal french "
                           "without changing the meaning"),
        Row(doc_id=4, text="translate this paragraph into formal french "
                           "without changing the meaning"),
        # unrelated doc
        Row(doc_id=5, text="the quarterly revenue table shows strong "
                           "growth across every region this year"),
        # boilerplate carriers: share only a hot shingle
        *[
            Row(doc_id=100 + i,
                text=f"subscribe to our newsletter today item {i} "
                     f"number {i * 7} extra {i * 13}")
            for i in range(6)
        ],
    ]
    return spark.createDataFrame(rows)


def test_exact_dup_scores_1000(spark, corpus):
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in rouge_l_pairs(
            corpus, n=3, max_df=3, trunc=40, threshold_milli=400
        ).collect()
    }
    assert (3, 4) in got
    r = got[(3, 4)]
    assert r["rouge_l_milli"] == 1000
    assert r["lcs_len"] == r["len_a"] == r["len_b"]


def test_insertion_paraphrase_caught_and_scored(spark, corpus):
    got = {
        (r["doc_a"], r["doc_b"]): r["rouge_l_milli"]
        for r in rouge_l_pairs(
            corpus, n=3, max_df=3, trunc=40, threshold_milli=400
        ).collect()
    }
    # docs 1/2: 13 vs 13 tokens, LCS 12 (one insertion, one move)
    # -> 2000*12 div 26 = 923
    assert got[(1, 2)] == 923
    # unrelated doc never pairs; ids ordered
    assert all(a < b for a, b in got)
    assert not any(5 in p for p in got)


def test_hot_shingle_guard_blocks_boilerplate_pairs(spark, corpus):
    # the 6 newsletter docs share "subscribe to our newsletter today"
    # shingles with df=6 > max_df=3, and nothing else in common -> no
    # candidate pairs among them
    got = rouge_l_pairs(
        corpus, n=3, max_df=3, trunc=40, threshold_milli=0
    ).where(F.col("doc_a") >= 100)
    assert got.count() == 0
    # raising max_df admits them as candidates (scores stay low)
    loose = rouge_l_pairs(
        corpus, n=3, max_df=20, trunc=40, threshold_milli=0
    ).where(F.col("doc_a") >= 100)
    assert loose.count() > 0


def test_truncation_bounds_scoring(spark):
    long_a = " ".join(f"w{i}" for i in range(500))
    long_b = " ".join(f"w{i}" for i in range(500))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=long_a), Row(doc_id=2, text=long_b)]
    )
    r = rouge_l_pairs(
        df, n=3, max_df=5, trunc=16, threshold_milli=0
    ).collect()[0]
    assert r["len_a"] == r["len_b"] == 16
    assert r["lcs_len"] == 16 and r["rouge_l_milli"] == 1000


def test_min_shared_prune_lossless_at_published_cut(spark, corpus):
    # at the 0.7 self-instruct threshold, the >=2-shared-shingle
    # candidate prune returns the same pairs as the exhaustive
    # min_shared=1 reference
    kw = dict(n=3, max_df=20, trunc=40, threshold_milli=700)
    strict = sorted(
        map(tuple, rouge_l_pairs(corpus, min_shared=2, **kw).collect())
    )
    loose = sorted(
        map(tuple, rouge_l_pairs(corpus, min_shared=1, **kw).collect())
    )
    assert strict == loose and len(strict) >= 2


def test_param_validation(spark, corpus):
    with pytest.raises(ValueError):
        rouge_l_pairs(corpus, n=0)
    with pytest.raises(ValueError):
        rouge_l_pairs(corpus, max_df=1)
    with pytest.raises(ValueError):
        rouge_l_pairs(corpus, n=5, trunc=4)
    with pytest.raises(ValueError):
        rouge_l_pairs(corpus, min_shared=0)


def test_plan_has_no_cartesian(spark, corpus):
    from tests.test_plans import plan_of

    plan = plan_of(rouge_l_pairs(corpus))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
