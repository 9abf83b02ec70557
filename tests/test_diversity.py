"""Distinct-n diversity (ops/diversity.py): multiplicity semantics,
template collapse detection, per-group rows, edge docs."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.diversity import distinct_ngram_diversity

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # diverse source: all unigrams unique
        Row(doc_id=1, source="web", text="alpha beta gamma delta"),
        Row(doc_id=2, source="web", text="epsilon zeta eta theta"),
        # collapsed source: one template repeated across docs
        *[Row(doc_id=10 + i, source="synth", text="click here now")
          for i in range(5)],
        # empty doc contributes nothing
        Row(doc_id=99, source="web", text="   "),
    ]
    return spark.createDataFrame(rows)


def _by_key(df):
    return {(r["group"], r["n"]): r for r in df.collect()}


def test_multiplicity_and_ratios(spark, docs):
    got = _by_key(distinct_ngram_diversity(docs, ns=(1, 2)))
    web1 = got[("web", 1)]
    assert web1["total_ngrams"] == 8 and web1["distinct_ngrams"] == 8
    assert web1["distinct_milli"] == 1000
    s1 = got[("synth", 1)]
    # 5 docs x 3 tokens, only 3 distinct -> collapse shows up
    assert s1["total_ngrams"] == 15 and s1["distinct_ngrams"] == 3
    assert s1["distinct_milli"] == 200
    s2 = got[("synth", 2)]
    assert s2["total_ngrams"] == 10 and s2["distinct_ngrams"] == 2


def test_no_rows_for_empty_mass(spark, docs):
    got = _by_key(distinct_ngram_diversity(docs, ns=(5,)))
    # no doc has 5 tokens -> no rows at n=5
    assert got == {}


def test_param_validation(spark, docs):
    with pytest.raises(ValueError):
        distinct_ngram_diversity(docs, ns=())
    with pytest.raises(ValueError):
        distinct_ngram_diversity(docs, ns=(0,))
