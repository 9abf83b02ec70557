"""Unigram-LM tokenizer (ops/unigram.py): Viterbi encode, hard-EM
counts, and the trainer pinned against a pure-Python reference."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.unigram import (
    DEFAULT_PIECES,
    MAX_PIECE,
    learn_unigram,
    unigram_em_counts,
    unigram_encode_words,
)

NEG = -(10**15)


def ref_viterbi(w, model, max_piece=MAX_PIECE):
    n = len(w)
    best = [(0, 0)] + [(NEG, 0)] * n
    for i in range(1, n + 1):
        cands = [(NEG, 0)]
        for l in range(1, min(max_piece, i) + 1):
            p = w[i - l : i]
            if p in model and best[i - l][0] > NEG:
                cands.append((best[i - l][0] + model[p], l))
        best[i] = max(cands)  # tuple order = longer-piece tie-break
    if best[n][0] <= NEG:
        return None
    toks, pos = [], n
    while pos > 0:
        l = best[pos][1]
        toks.insert(0, w[pos - l : pos])
        pos -= l
    return best[n][0], toks


def _encode(spark, words, **kw):
    df = spark.createDataFrame([Row(word=w) for w in words])
    return {r["word"]: r for r in unigram_encode_words(df, **kw).collect()}


def test_viterbi_prefers_best_segmentation(spark):
    got = _encode(spark, ["thewindow", "customer", "join"])
    assert got["thewindow"]["pieces"] == "the window"
    assert got["thewindow"]["score_milli"] == -2100 - 2250
    # 'customer' has no whole piece: cu+st+om+er beats char path
    assert got["customer"]["pieces"] == "cu st om er"
    assert got["join"]["n_tokens"] == 1


def test_tie_breaks_prefer_longer_piece(spark):
    model = {"a": -10, "aa": -20}
    got = _encode(spark, ["aa"], pieces=model, max_piece=2)
    # a+a and aa both score -20; struct (s, l) max picks l=2
    assert got["aa"]["pieces"] == "aa"


def test_unsegmentable_and_oversized_are_null(spark):
    got = _encode(spark, ["x$z"])
    assert got["x$z"]["n_tokens"] is None
    long_word = "a" * 30  # > max_word=24
    got = _encode(spark, [long_word])
    assert got[long_word]["n_tokens"] is None


def test_matches_reference_on_corpus_words(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = [
        r["w"]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("w")
        )
        .where(F.col("w") != "")
        .distinct()
        .collect()
    ]
    got = _encode(spark, words)
    for w in words:
        score, toks = ref_viterbi(w, DEFAULT_PIECES)
        assert got[w]["score_milli"] == score, w
        assert got[w]["pieces"] == " ".join(toks), w


def test_em_counts_hand_computed(spark):
    docs = spark.createDataFrame(
        [Row(text="the window filter join join hash")]
    )
    got = {r["piece"]: r for r in unigram_em_counts(docs).collect()}
    assert got["join"]["n_count"] == 2
    assert got["join"]["p_micro"] == 2 * 1_000_000 // 6
    assert set(got) == {"the", "window", "filter", "join", "hash"}


def ref_learn(texts, max_piece=MAX_PIECE, vocab_size=48, iterations=2,
              prune_frac=0.25):
    from collections import Counter

    freq = Counter(w for t in texts for w in t.split(" ") if w)
    seed = Counter()
    for w, c in freq.items():
        for l in range(1, max_piece + 1):
            for i in range(len(w) - l + 1):
                seed[w[i : i + l]] += c
    total = sum(seed.values())
    model = {p: round(1000 * math.log(c / total)) for p, c in seed.items()}
    for _ in range(iterations):
        counts = Counter()
        for w, c in freq.items():
            res = ref_viterbi(w, model, max_piece)
            if res:
                for tok in res[1]:
                    counts[tok] += c
        multi = sorted(
            (p for p in model if len(p) > 1),
            key=lambda p: (counts.get(p, 0), p),
        )
        n_single = sum(1 for p in model if len(p) == 1)
        target_multi = max(vocab_size - n_single, 0)
        drop = max(int(len(multi) * prune_frac), len(multi) - target_multi)
        kept = set(multi[drop:]) if drop > 0 else set(multi)
        t = sum(c for p, c in counts.items() if len(p) == 1 or p in kept)
        model = {
            p: round(1000 * math.log(max(counts.get(p, 0), 1) / t))
            for p in model
            if len(p) == 1 or p in kept
        }
    return model


def test_learn_unigram_matches_reference(spark):
    texts = [
        "the window filter join join hash",
        "scan the table order by key",
        "join hash join merge sort sort",
    ]
    docs = spark.createDataFrame([Row(text=t) for t in texts])
    got = {
        r["piece"]: r["score_milli"]
        for r in learn_unigram(docs, vocab_size=40, iterations=2).collect()
    }
    want = ref_learn(texts, vocab_size=40, iterations=2)
    assert got == want
    # every corpus char survives pruning (coverage invariant)
    chars = {c for t in texts for c in t if c != " "}
    assert chars <= set(got)


def test_doc_tokens_rollup_and_oov(spark):
    from reader_spark.ops.unigram import unigram_doc_tokens

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the window x$z"),
            Row(doc_id=2, text="join join"),
        ]
    )
    got = {r["doc_id"]: r for r in unigram_doc_tokens(docs).collect()}
    # 'the'=1 tok, 'window'=1 tok, 'x$z' OOV (excluded, counted)
    assert got[1]["n_words"] == 3
    assert got[1]["unigram_tokens"] == 2
    assert got[1]["n_oov"] == 1
    assert got[2]["unigram_tokens"] == 2 and got[2]["n_oov"] == 0
