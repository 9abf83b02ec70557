"""Exact-BPE tokenizer (ops/bpe.py): greedy fixed-pass semantics vs an
independent Python reference, edge cases, and the at-scale plan shape."""

import re

import pytest
from pyspark.sql import functions as F

from reader_spark.ops.bpe import (
    DEFAULT_MERGES,
    bpe_doc_tokens_expr,
    bpe_encode_words,
    bpe_token_counts,
)


def ref_encode(word: str, merges=DEFAULT_MERGES) -> list[str]:
    """Independent reference: symbol-list BPE, each merge applied once in
    rank order, greedy leftmost non-overlapping."""
    syms = list(word) + ["</w>"]
    for l, r in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def ref_doc_tokens(text: str) -> int:
    return sum(
        len(ref_encode(w))
        for w in re.split("[^a-z0-9]+", text.lower())
        if w
    )


WORDS = [
    "the", "thing", "things", "and", "standing", "for", "all", "with",
    "information", "aaaa", "ananan", "x", "1234", "tion", "aana",
    "thethe", "inging", "erer", "toto", "offof",
]


def test_encode_matches_reference_per_word(spark):
    df = spark.createDataFrame(
        [(w, w) for w in WORDS], "doc_id string, text string"
    )
    got = {
        r.word: list(r.tokens) for r in bpe_encode_words(df).collect()
    }
    for w in WORDS:
        assert got[w] == ref_encode(w), w


def test_doc_counts_match_reference(spark):
    texts = [
        "The quick brown fox, with all the usual TRIMMINGS!",
        "",
        "   ",
        "an an an an an",
        "mixing 123 and abc123def",
        "punctuation-only !!! ???",
    ]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )
    got = {r.doc_id: (r.n_words, r.bpe_tokens) for r in bpe_token_counts(df).collect()}
    for i, t in enumerate(texts):
        words = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        assert got[str(i)] == (len(words), ref_doc_tokens(t)), t


def test_fertility_null_on_empty_and_ratio_otherwise(spark):
    df = spark.createDataFrame(
        [("a", "the the"), ("b", "!!!")], "doc_id string, text string"
    )
    rows = {r.doc_id: r for r in bpe_token_counts(df).collect()}
    assert rows["b"].fertility is None
    assert rows["a"].fertility == 1.0  # 'the' -> [the</w>]


def test_merge_symbols_reject_pipe(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        bpe_token_counts(df, merges=(("a", "|"),)).collect()


def test_overlapping_run_merges_greedy_left(spark):
    """'ananan' under merge (a,n): greedy leftmost pairs (0,1),(2,3),(4,5)
    -> [an, an, an, </w>] before later merges touch it. The |sym|
    rendering must not skip alternate occurrences (the space-separated
    rendering's classic bug)."""
    df = spark.createDataFrame([("d", "ananan")], "doc_id string, text string")
    toks = bpe_encode_words(df).head().tokens
    assert list(toks) == ref_encode("ananan")
    assert toks[0] == "an" and toks[1] == "an" and toks[2] == "an"


def test_bpe_count_is_scan_bound(spark):
    """No Exchange before the count column exists: the fold is within-row
    and rides the parquet scan (the 100 TB shape)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = docs.select("doc_id", bpe_doc_tokens_expr(F.col("text")).alias("t"))
    tree = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ).split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Scan parquet" in tree


def test_packing_consumes_exact_column(spark):
    """pack_by_cost over bpe_tokens: per-doc segment sums equal the exact
    BPE count (the packing-accepts-the-exact-column contract)."""
    from reader_spark.ops.packing import pack_by_cost

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    counts = bpe_token_counts(docs).select("doc_id", "bpe_tokens")
    packed = pack_by_cost(counts, "doc_id", "bpe_tokens", 512)
    per_doc = packed.groupBy("doc_id").agg(F.sum("n_tokens").alias("s"))
    joined = per_doc.join(counts, "doc_id").where(
        F.col("s") != F.col("bpe_tokens")
    )
    assert joined.count() == 0


def ref_learn(texts, n_merges):
    """Independent reference learner: subword-nmt-style get_stats +
    merge, ties broken (count desc, lhs, rhs)."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in re.split("[^a-z0-9]+", t.lower()):
            if w:
                vocab[tuple(list(w) + ["</w>"])] += 1
    merges = []
    for rank in range(n_merges):
        stats = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (l, r), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, cnt))
        new = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += c
        vocab = new
    return merges


def test_learn_matches_reference(spark):
    from reader_spark.ops.bpe import learn_bpe_merges

    texts = [
        "the cat and the hat sat on the mat",
        "the bats and the rats ate the oats",
        "standing and sitting and knitting",
        "aaa aaaa aaaaa",
    ]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in learn_bpe_merges(df, n_merges=10).orderBy("merge_rank").collect()
    ]
    assert got == ref_learn(texts, 10)


def test_learn_roundtrip_into_encoder(spark):
    """The learned table is directly consumable by bpe_token_counts and
    strictly compresses vs the unmerged (char) tokenization."""
    from reader_spark.ops.bpe import learn_bpe_merges

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    learned = [
        (r.lhs, r.rhs)
        for r in learn_bpe_merges(docs, n_merges=12).orderBy("merge_rank").collect()
    ]
    assert len(learned) == 12
    with_m = bpe_token_counts(docs, merges=tuple(learned))
    no_m = bpe_token_counts(docs, merges=())
    tot_m = with_m.agg(F.sum("bpe_tokens")).head()[0]
    tot_0 = no_m.agg(F.sum("bpe_tokens")).head()[0]
    assert tot_m < tot_0


def test_learn_stops_when_exhausted(spark):
    from reader_spark.ops.bpe import learn_bpe_merges

    df = spark.createDataFrame([("a", "ab")], "doc_id string, text string")
    # 'ab' -> a b </w>: only 2 pairs exist, then 1, then 0
    got = learn_bpe_merges(df, n_merges=10).collect()
    assert len(got) < 10
