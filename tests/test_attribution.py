"""Lexical training-data attribution (ops/attribution.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.attribution import eval_attribution, word_ngrams

pytestmark = pytest.mark.spark


def test_word_ngrams_distinct_and_short_docs(spark):
    df = spark.createDataFrame(
        [
            Row(t="The cat sat; the cat sat"),
            Row(t="two words"),
            Row(t=""),
        ]
    )
    got = [r["g"] for r in df.select(word_ngrams(F.col("t"), 3).alias("g")).collect()]
    assert sorted(got[0]) == ["cat sat the", "sat the cat", "the cat sat"]
    assert got[1] == [] and got[2] == []


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        Row(doc_id=0, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=1, text="alpha beta gamma something else entirely here"),
        Row(doc_id=2, text="unrelated words about spark shuffles"),
        # boilerplate carrier docs: same slogan everywhere
        *[Row(doc_id=100 + i, text=f"buy now click here offer {i}")
          for i in range(8)],
    ]
    return spark.createDataFrame(rows)


def test_attribution_ranks_source_doc_first(spark, corpus):
    evals = spark.createDataFrame(
        [Row(eval_id=900, text="alpha beta gamma delta")]
    )
    got = eval_attribution(corpus, evals, n=3, k=3, max_df=100).collect()
    ranked = sorted(got, key=lambda r: r["rank"])
    assert ranked[0]["doc_id"] == 0 and ranked[0]["shared_ngrams"] == 2
    assert ranked[1]["doc_id"] == 1 and ranked[1]["shared_ngrams"] == 1


def test_max_df_guard_kills_boilerplate(spark, corpus):
    evals = spark.createDataFrame(
        [Row(eval_id=901, text="buy now click here today")]
    )
    open_hits = eval_attribution(corpus, evals, n=3, k=10, max_df=100).collect()
    guarded = eval_attribution(corpus, evals, n=3, k=10, max_df=5).collect()
    assert len(open_hits) == 8      # the slogan fans out to every carrier
    assert guarded == []            # df=8 > max_df=5: never enters the join


def test_tie_breaks_smaller_doc_id(spark):
    train = spark.createDataFrame(
        [
            Row(doc_id=7, text="one two three four"),
            Row(doc_id=3, text="one two three five"),
        ]
    )
    evals = spark.createDataFrame([Row(eval_id=0, text="one two three")])
    got = sorted(
        eval_attribution(train, evals, n=3, k=2).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["doc_id"] for r in got] == [3, 7]


def test_validation(spark, corpus):
    evals = spark.createDataFrame([Row(eval_id=0, text="x")])
    with pytest.raises(ValueError):
        eval_attribution(corpus, evals, n=0)
