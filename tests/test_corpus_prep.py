"""Composite training-data prep pipeline: extraction -> quality gate ->
exact dedup -> near-dup clustering -> keeper corpus."""

import pytest

from reader_spark.spark.corpus_prep import CorpusPrepConfig, prepare_corpus
from reader_spark.spark.job import docs_from_rows

pytestmark = pytest.mark.spark

BODY = (
    "the engine shuffles partitions while arrow batches stream through the "
    "fused pipeline and deterministic seeded content keeps every assertion "
    "stable across runs of the corpus preparation test suite"
)


def html_doc(doc_id, body):
    return {
        "doc_id": doc_id,
        "spans": [
            {
                "kind": "html",
                "text": f"<html><body><main><h1>T</h1><p>{body}</p></main></body></html>",
                "media_ref": None,
                "offset": 0,
            }
        ],
    }


def test_prepare_corpus(spark):
    rows = [
        html_doc("a-keep", BODY),
        html_doc("b-exact-dup", BODY),  # exact dup of a-keep (same markdown)
        html_doc("c-near-dup", BODY.replace("stable", "steady")),
        html_doc("d-distinct", "entirely different prose about databases and "
                 "storage engines with columnar formats and vectorized "
                 "execution that shares no shingles with the other documents "
                 "in this synthetic corpus at all"),
        html_doc("e-too-short", "tiny"),
        {"doc_id": "f-error", "spans": [{"kind": "html", "text": "   ", "media_ref": None, "offset": 0}]},
    ]
    docs = docs_from_rows(spark, rows)
    clean = prepare_corpus(docs, prep=CorpusPrepConfig(min_tokens=10))
    kept = {r["doc_id"] for r in clean.collect()}
    # exact dup collapses to min id; near-dup cluster keeps min id;
    # short + error docs gated out.
    assert kept == {"a-keep", "d-distinct"}


def test_prepare_corpus_stats_columns(spark):
    docs = docs_from_rows(spark, [html_doc("x", BODY)])
    row = prepare_corpus(docs, prep=CorpusPrepConfig(min_tokens=5)).collect()[0]
    assert row["token_count"] > 10
    assert 0.0 <= row["punct_ratio"] < 0.3
    assert row["spans"][0]["kind"] == "heading"
