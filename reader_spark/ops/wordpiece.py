"""WordPiece tokenization: greedy longest-match-first encode.

The third trained-tokenizer family next to BPE (ops/bpe.py, Sennrich
2016) and unigram-LM (ops/unigram.py, Kudo 2018): Schuster & Nakajima
2012's WordPiece, as shipped by BERT (Devlin 2019) — segment a word by
repeatedly taking the LONGEST vocab piece matching at the cursor;
pieces that do not start the word carry the ``##`` continuation
prefix; a word that cannot be fully segmented (or exceeds
``max_word`` chars, BERT's ``max_input_chars_per_word`` guard)
becomes a single ``[UNK]`` token.

Determinism contract: the model artifact is a literal piece VOCAB
(membership only — WordPiece encode uses no scores at inference), so
Spark and the DuckDB oracle twin (the same greedy walk as a recursive
CTE) agree bit-for-bit; no floats anywhere.

Shape at 100 TB: encoding is a WITHIN-ROW fold (F.aggregate over at
most ``max_word`` cursor steps — each consumes >=1 char) over the
DISTINCT-word dim, joined back to occurrences on the word key; the
vocab rides as a literal map in the expression tree (a trained
30k-piece vocab at production scale becomes a broadcast join on the
piece key — same plan shape as ops/bpe.py's merge table and
ops/unigram.py's piece model). No Python UDF, no extra shuffle beyond
the word-dim groupBy.

Reference behavior spec: like ops/bpe.py and ops/unigram.py, this
supplies exact token accounting for the budget/packing operators
(/root/reference/src/formatters/markdown.ts word-count accounting is
the reference's whitespace proxy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALPHA = "abcdefghijklmnopqrstuvwxyz"

# Literal WordPiece vocab over the fixture corpus alphabet: every base
# char in BOTH positions (start + ## continuation) so pure-alpha words
# always segment — [UNK] is reserved for non-alpha chars and oversize
# words, exactly BERT's behavior with byte-level fallback absent.
DEFAULT_VOCAB: tuple[str, ...] = tuple(dict.fromkeys(
    [*_ALPHA]
    + ["##" + c for c in _ALPHA]
    + [
        "the", "join", "hash", "row", "scan", "table", "column",
        "filter", "batch", "merge", "vector", "line", "key", "part",
        "window", "group", "spark", "data", "sort", "order", "small",
        "slow", "big", "dup", "fast", "index", "shard",
        "##s", "##es", "##ed", "##er", "##ing", "##ion", "##tion",
        "##able", "##ble", "##ter", "##ow", "##an", "##in", "##ly",
    ]
))

MAX_PIECE = 6  # longest piece in DEFAULT_VOCAB, ## prefix excluded
UNK = "[UNK]"


def _vocab_map(vocab: tuple[str, ...]) -> Column:
    kv: list[Column] = []
    for p in vocab:
        kv.append(F.lit(p))
        kv.append(F.lit(1))
    return F.create_map(*kv)


def wordpiece_expr(
    word: Column,
    vocab: tuple[str, ...] = DEFAULT_VOCAB,
    max_piece: int = MAX_PIECE,
    max_word: int = 24,
) -> Column:
    """Greedy longest-match WordPiece encode of one word as a
    within-row fold.

    Returns struct<n_tokens:int, toks:array<string>, is_unk:int>.
    The accumulator is struct(pos, toks); pos == -1 signals a dead
    walk (no piece matches at the cursor). Each step consumes at
    least one char, so ``max_word`` iterations suffice; words longer
    than ``max_word`` or with a dead walk emit the single [UNK]."""
    return _walk_result(
        word, _wordpiece_walk(word, vocab, max_piece, max_word), max_word
    )


def _wordpiece_walk(
    word: Column,
    vocab: tuple[str, ...] = DEFAULT_VOCAB,
    max_piece: int = MAX_PIECE,
    max_word: int = 24,
) -> Column:
    """The greedy walk fold alone — callers bind it to a column ONCE
    and feed it to :func:`_walk_result`: referencing the fold from
    several output columns re-evaluates the whole walk per reference
    in interpreted mode (the staged form runs it once per word)."""
    m = _vocab_map(vocab)
    n = F.length(word)

    init = F.struct(
        F.lit(0).alias("pos"),
        F.array().cast("array<string>").alias("toks"),
    )

    def step(acc: Column, _i: Column) -> Column:
        pos = acc["pos"]
        # Longest match first: l = max_piece down to 1; the piece key
        # carries the ## prefix whenever the cursor is past the start.
        branch = F.struct(F.lit(-1).alias("pos"), acc["toks"].alias("toks"))
        for l in range(1, max_piece + 1):
            raw = F.substr(word, pos + 1, F.lit(l))
            key = F.when(pos == 0, raw).otherwise(F.concat(F.lit("##"), raw))
            hit = (pos + F.lit(l) <= n) & F.element_at(m, key).isNotNull()
            branch = F.when(
                hit,
                F.struct(
                    (pos + F.lit(l)).alias("pos"),
                    F.concat(acc["toks"], F.array(key)).alias("toks"),
                ),
            ).otherwise(branch)
        return F.when((pos < 0) | (pos >= n), acc).otherwise(branch)

    return F.aggregate(F.sequence(F.lit(1), F.lit(max_word)), init, step)


def _walk_result(word: Column, walk: Column, max_word: int = 24) -> Column:
    """Verdict struct from a BOUND walk column."""
    n = F.length(word)
    ok = (walk["pos"] == n) & (n > 0) & (n <= max_word)
    return F.when(
        ok,
        F.struct(
            F.size(walk["toks"]).alias("n_tokens"),
            walk["toks"].alias("toks"),
            F.lit(0).alias("is_unk"),
        ),
    ).otherwise(
        F.struct(
            F.lit(1).alias("n_tokens"),
            F.array(F.lit(UNK)).alias("toks"),
            F.lit(1).alias("is_unk"),
        )
    )


def wordpiece_encode_words(
    words: DataFrame,
    word_col: str = "word",
    vocab: tuple[str, ...] = DEFAULT_VOCAB,
    max_piece: int = MAX_PIECE,
) -> DataFrame:
    """Encode a word dim: (word, n_tokens, pieces, is_unk) with pieces
    space-joined. Pure map over the dim — no shuffle; the walk fold
    and the verdict struct stage through projections so each runs once
    per word instead of once per output-column reference."""
    staged = words.select(
        F.col(word_col),
        _wordpiece_walk(F.col(word_col), vocab, max_piece).alias("__w"),
    ).select(
        F.col(word_col),
        _walk_result(F.col(word_col), F.col("__w")).alias("__v"),
    )
    return staged.select(
        word_col,
        F.col("__v.n_tokens").alias("n_tokens"),
        F.array_join(F.col("__v.toks"), " ").alias("pieces"),
        F.col("__v.is_unk").alias("is_unk"),
    )


def wordpiece_doc_tokens(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: tuple[str, ...] = DEFAULT_VOCAB,
    max_piece: int = MAX_PIECE,
) -> DataFrame:
    """Per-doc exact WordPiece token counts: the greedy fold runs once
    per DISTINCT word, joins back to occurrences on the word key, then
    ONE doc rollup — the WordPiece twin of bpe_token_counts /
    unigram_doc_tokens for the packing/budget operators.

    Columns: (doc_id, n_words, wp_tokens, n_unk)."""
    occ = (
        docs.select(
            id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .where(F.col("word") != "")
    )
    dim = occ.select("word").distinct()
    enc = wordpiece_encode_words(dim, "word", vocab, max_piece)
    return (
        occ.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tokens").alias("wp_tokens"),
            F.sum("is_unk").alias("n_unk"),
        )
    )


def wordpiece_encode_py(
    word: str,
    vocab: tuple[str, ...] = DEFAULT_VOCAB,
    max_piece: int = MAX_PIECE,
    max_word: int = 24,
) -> list[str]:
    """Pure-Python reference (test pin): the textbook greedy loop."""
    vs = set(vocab)
    if not word or len(word) > max_word:
        return [UNK]
    pos, toks = 0, []
    while pos < len(word):
        for l in range(min(max_piece, len(word) - pos), 0, -1):
            cand = word[pos : pos + l]
            key = cand if pos == 0 else "##" + cand
            if key in vs:
                toks.append(key)
                pos += l
                break
        else:
            return [UNK]
    return toks
