"""WordPiece tokenizer (ops/wordpiece.py): greedy longest-match-first
encode pinned against the pure-Python reference, UNK semantics, and
the per-doc rollup."""

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.wordpiece import (
    DEFAULT_VOCAB,
    UNK,
    wordpiece_doc_tokens,
    wordpiece_encode_py,
    wordpiece_encode_words,
)


def _encode(spark, words, **kw):
    df = spark.createDataFrame([Row(word=w) for w in words])
    return {r["word"]: r for r in wordpiece_encode_words(df, **kw).collect()}


def test_greedy_longest_match_first(spark):
    got = _encode(spark, ["table", "tables", "filtering", "thes", "batches"])
    assert got["table"]["pieces"] == "table"
    assert got["tables"]["pieces"] == "table ##s"
    assert got["filtering"]["pieces"] == "filter ##ing"
    # longest match at the START wins even when a shorter split exists
    assert got["thes"]["pieces"] == "the ##s"
    assert got["batches"]["pieces"] == "batch ##es"
    assert all(r["is_unk"] == 0 for r in got.values())


def test_continuation_prefix_only_past_start(spark):
    # 'sstar': no 'ss*' start piece -> 's' then continuations
    got = _encode(spark, ["stheory"])
    toks = got["stheory"]["pieces"].split(" ")
    assert toks[0] in DEFAULT_VOCAB  # start form, no ##
    assert all(t.startswith("##") for t in toks[1:])


def test_unk_on_nonalpha_and_oversize(spark):
    long_word = "a" * 25
    got = _encode(spark, ["x9y", long_word, "ok"])
    assert got["x9y"]["pieces"] == UNK
    assert got["x9y"]["n_tokens"] == 1
    assert got["x9y"]["is_unk"] == 1
    assert got[long_word]["pieces"] == UNK
    assert got["ok"]["is_unk"] == 0


def test_matches_pure_python_on_random_words(spark):
    rng = random.Random(77)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    words = set()
    for _ in range(300):
        n = rng.randint(1, 26)
        w = "".join(rng.choice(alpha + "3") for _ in range(n))
        words.add(w)
    got = _encode(spark, sorted(words))
    for w in words:
        ref = wordpiece_encode_py(w)
        assert got[w]["pieces"] == " ".join(ref), w
        assert got[w]["n_tokens"] == len(ref), w
        assert got[w]["is_unk"] == (1 if ref == [UNK] else 0), w


def test_doc_tokens_rollup(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the tables join"),
            Row(doc_id=2, text="x9 filtering  "),
        ]
    )
    got = {r["doc_id"]: r for r in wordpiece_doc_tokens(docs).collect()}
    # the=1, tables=2 (table ##s), join=1
    assert got[1]["n_words"] == 3
    assert got[1]["wp_tokens"] == 4
    assert got[1]["n_unk"] == 0
    # x9 -> UNK (1 tok), filtering -> 2
    assert got[2]["n_words"] == 2
    assert got[2]["wp_tokens"] == 3
    assert got[2]["n_unk"] == 1
