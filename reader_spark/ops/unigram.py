"""Unigram-LM (SentencePiece) tokenization: Viterbi encode + hard-EM.

The second trained-tokenizer family next to BPE (ops/bpe.py, Sennrich
2016): Kudo 2018's unigram language model segments a word into the
piece sequence maximizing Σ log p(piece) — the model artifact is a
(piece, log-prob) table, and encoding is a per-word Viterbi DP.

Determinism contract: the model ships INTEGER milli-log scores (what a
trained SentencePiece model's float log-probs round to); the DP
maximizes an integer sum, and ties prefer the longer final piece via
struct (score, len) comparison — so Spark and the DuckDB oracle twin
(the same DP as a recursive CTE) agree bit-for-bit. No float crosses
an engine boundary; the only floats live in ``learn_unigram``'s
score refresh (production path, pytest-pinned against a pure-Python
reference).

Shape at 100 TB: encoding is a WITHIN-ROW fold (F.aggregate over the
word's positions — bounded by max_word) over the DISTINCT-word dim,
joined back to occurrences on the word key; the model rides as a
literal map in the expression tree (a trained vocab at production
scale becomes a broadcast join on the piece key — same plan shape as
ops/bpe.py's merge table). Hard-EM's E-step is the same fold + ONE
piece-keyed groupBy; the M-step normalizer is a 1-row broadcast dim.

Reference behavior spec: like ops/bpe.py, this supplies exact token
accounting for the budget/packing operators
(/root/reference/src/formatters/markdown.ts word-count accounting is
the reference's proxy).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Literal unigram model over the fixture corpus alphabet: every base
# char (full coverage, as SentencePiece requires) plus multi-char
# pieces. Scores are milli-log-probs (round(1000 * ln p)) — the
# artifact a trained model ships.
_BASE = {c: -4000 for c in "abcdefghijklmnopqrstuvwxyz"}
DEFAULT_PIECES: dict[str, int] = {
    **_BASE,
    "th": -3200, "the": -2100, "in": -2900, "jo": -3400, "join": -2400,
    "ha": -3350, "sh": -3100, "hash": -2450, "row": -2500, "an": -2950,
    "sc": -3450, "scan": -2480, "er": -2800, "or": -2850, "ta": -3250,
    "ble": -3050, "table": -2350, "co": -3300, "lu": -3600, "mn": -3700,
    "column": -2300, "fil": -3150, "ter": -2750, "filter": -2320,
    "ba": -3420, "tch": -3080, "batch": -2380, "cu": -3520, "st": -3010,
    "om": -3360, "sm": -3560, "all": -2980, "sl": -3580, "ow": -2990,
    "me": -3240, "rge": -3380, "merge": -2420, "de": -3290, "da": -3310,
    "ve": -3330, "ct": -3370, "vector": -2340, "li": -3390, "ne": -3060,
    "line": -2520, "ke": -3410, "ey": -3430, "key": -2650, "pa": -3440,
    "rt": -3070, "part": -2460, "wi": -3460, "nd": -3090,
    "window": -2250, "gr": -3470, "ou": -3480, "up": -3110,
    "group": -2440, "sp": -3490, "ar": -3020, "rk": -3510,
    "spark": -2360, "du": -3530, "dup": -2700, "bi": -3540, "ig": -3550,
    "big": -2720, "so": -3570, "data": -2430, "sort": -2470,
    "slow": -2530, "small": -2390, "order": -2410, "at": -3030,
}

MAX_PIECE = 6  # longest piece in DEFAULT_PIECES
_NEG_INF = -(10**15)


def _model_map(pieces: dict[str, int]) -> Column:
    kv: list[Column] = []
    for p, s in pieces.items():
        kv.append(F.lit(p))
        kv.append(F.lit(int(s)).cast("long"))
    return F.create_map(*kv)


def _viterbi_bests(
    word: Column,
    pieces: dict[str, int] = DEFAULT_PIECES,
    max_piece: int = MAX_PIECE,
) -> Column:
    """The forward DP table alone — callers bind it to a column ONCE
    and feed it to :func:`_viterbi_result`. Referencing the fold
    expression from several output columns (or from every backtrack
    step) re-evaluates the whole DP per reference in interpreted mode;
    staging it through a projection makes it a per-row attribute read
    (measured: encode of the word dim ~6x faster)."""
    m = _model_map(pieces)
    n = F.length(word)
    dead = F.struct(
        F.lit(_NEG_INF).cast("long").alias("s"), F.lit(0).alias("l")
    )
    init = F.array(
        F.struct(F.lit(0).cast("long").alias("s"), F.lit(0).alias("l"))
    )

    def dp_step(acc: Column, i: Column) -> Column:
        cands = []
        for l in range(1, max_piece + 1):
            piece = F.substr(word, i - F.lit(l) + 1, F.lit(l))
            sc = F.element_at(m, piece)
            prev = F.element_at(acc, (i - F.lit(l) + 1).cast("int"))
            ok = (F.lit(l) <= i) & sc.isNotNull() & (prev["s"] > _NEG_INF)
            cands.append(
                F.when(
                    ok,
                    F.struct(
                        (prev["s"] + sc).alias("s"), F.lit(l).alias("l")
                    ),
                ).otherwise(dead)
            )
        return F.concat(acc, F.array(F.greatest(*cands)))

    return F.aggregate(F.sequence(F.lit(1), n), init, dp_step)


def _viterbi_result(
    word: Column,
    bests: Column,
    max_word: int = 24,
) -> Column:
    """Backtrack + validity from a BOUND DP table column.

    Returns struct<score_milli:long, n_tokens:int, toks:array<string>>;
    NULL fields when the word is unsegmentable (a char outside the
    model) or longer than ``max_word``. ``bests[k]`` (1-based list
    index k+1) holds the best (score, last-piece-len) for the length-k
    prefix; ties prefer the longer last piece (struct max)."""
    n = F.length(word)
    final = F.element_at(bests, (n + 1).cast("int"))
    valid = (final["s"] > _NEG_INF) & (n <= max_word) & (n > 0)

    bt_init = F.struct(
        n.cast("int").alias("pos"),
        F.array().cast("array<string>").alias("toks"),
    )

    def bt_step(acc: Column, _i: Column) -> Column:
        l = F.element_at(bests, acc["pos"] + 1)["l"]
        return F.when(
            (acc["pos"] <= 0) | (l <= 0), acc
        ).otherwise(
            F.struct(
                (acc["pos"] - l).alias("pos"),
                F.concat(
                    F.array(F.substr(word, acc["pos"] - l + 1, l)),
                    acc["toks"],
                ).alias("toks"),
            )
        )

    toks = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_word)), bt_init, bt_step
    )["toks"]
    return F.when(
        valid,
        F.struct(
            final["s"].alias("score_milli"),
            F.size(toks).alias("n_tokens"),
            toks.alias("toks"),
        ),
    ).otherwise(
        F.struct(
            F.lit(None).cast("long").alias("score_milli"),
            F.lit(None).cast("int").alias("n_tokens"),
            F.lit(None).cast("array<string>").alias("toks"),
        )
    )


def unigram_viterbi_expr(
    word: Column,
    pieces: dict[str, int] = DEFAULT_PIECES,
    max_piece: int = MAX_PIECE,
    max_word: int = 24,
) -> Column:
    """Single-expression form (DP + backtrack fused) — kept for
    composability; per-dim encoders should stage
    :func:`_viterbi_bests` through a projection instead (see
    :func:`unigram_encode_words`)."""
    return _viterbi_result(
        word, _viterbi_bests(word, pieces, max_piece), max_word
    )


def unigram_encode_words(
    words: DataFrame,
    word_col: str = "word",
    pieces: dict[str, int] = DEFAULT_PIECES,
    max_piece: int = MAX_PIECE,
) -> DataFrame:
    """Encode a word dim: (word, n_tokens, score_milli, pieces) with
    pieces space-joined. Pure map over the dim; the DP table and the
    result struct are staged through projections so each fold runs
    once per word instead of once per output-column reference."""
    staged = words.select(
        F.col(word_col),
        _viterbi_bests(F.col(word_col), pieces, max_piece).alias("__b"),
    ).select(
        F.col(word_col),
        _viterbi_result(F.col(word_col), F.col("__b")).alias("__v"),
    )
    return staged.select(
        word_col,
        F.col("__v.n_tokens").alias("n_tokens"),
        F.col("__v.score_milli").alias("score_milli"),
        F.array_join(F.col("__v.toks"), " ").alias("pieces"),
    )


def unigram_em_counts(
    docs: DataFrame,
    text_col: str = "text",
    pieces: dict[str, int] = DEFAULT_PIECES,
    max_piece: int = MAX_PIECE,
) -> DataFrame:
    """One hard-EM E-step + integer M-step over a corpus: Viterbi-
    segment the DISTINCT-word dim under the current model, weight each
    piece by corpus word frequency, and emit (piece, n_count, p_micro)
    where p_micro = count * 1e6 DIV total — the re-estimated
    probabilities in exact micro-units (production converts to
    milli-log scores for the next round; see learn_unigram).

    Shuffles: one word-frequency groupBy, one piece groupBy; the
    Viterbi fold runs once per DISTINCT word, not per occurrence; the
    normalizer rides back as a 1-row broadcast dim (the documented
    scalar-dim crossJoin)."""
    freq = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
    )
    staged = freq.select(
        "word",
        "n_word",
        _viterbi_bests(F.col("word"), pieces, max_piece).alias("__b"),
    )
    # The explode consumes the bound DP column directly: a separate
    # projection for the backtrack result gets collapsed back into the
    # generator by the optimizer (re-inlining the DP fold), while a
    # Project under Generate survives.
    seg = staged.select(
        "n_word",
        F.explode(
            _viterbi_result(F.col("word"), F.col("__b"))["toks"]
        ).alias("piece"),
    )
    counts = seg.groupBy("piece").agg(
        F.sum("n_word").alias("n_count")
    )
    total = counts.agg(F.sum("n_count").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("p_micro", F.expr("n_count * 1000000L DIV _total"))
        .select("piece", "n_count", "p_micro")
    )


def learn_unigram(
    docs: DataFrame,
    text_col: str = "text",
    seed_max_piece: int = MAX_PIECE,
    vocab_size: int = 48,
    iterations: int = 2,
    prune_frac: float = 0.25,
) -> DataFrame:
    """Train a unigram model (Kudo 2018, hard-EM variant): seed the
    vocab with every substring (len ≤ seed_max_piece) of the corpus
    weighted by frequency, then alternate Viterbi E-steps with
    count-renormalizing M-steps, pruning the lowest-count multi-char
    pieces each round (single chars are never pruned — coverage) until
    ``vocab_size`` remains. Returns (piece, score_milli).

    The per-round model is collected to the driver as a bounded
    vocab-sized literal (same contract as the BPE merge table and the
    k×dim codebook literals); corpus passes stay distributed. Scores
    are round(1000·ln p) — float only here, never in an oracle path.
    """
    freq = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
    )
    subs = freq.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.lit(seed_max_piece)),
                    lambda l: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(
                                F.length("word") - l + 1, F.lit(0)
                            ),
                        ),
                        lambda i: F.substr(F.col("word"), i, l),
                    ),
                )
            )
        ).alias("piece"),
        F.col("n_word"),
    )
    seed = subs.groupBy("piece").agg(F.sum("n_word").alias("n_count"))
    rows = seed.collect()  # bounded: vocab-seed over the word dim
    total = sum(r["n_count"] for r in rows)
    model = {
        r["piece"]: round(1000 * math.log(r["n_count"] / total))
        for r in rows
    }
    for _ in range(iterations):
        em = unigram_em_counts(
            docs, text_col, pieces=model, max_piece=seed_max_piece
        ).collect()
        counts = {r["piece"]: r["n_count"] for r in em}
        # prune lowest-count multi-char pieces (deterministic order:
        # count asc, piece asc), keep all single chars
        multi = sorted(
            (p for p in model if len(p) > 1),
            key=lambda p: (counts.get(p, 0), p),
        )
        n_single = sum(1 for p in model if len(p) == 1)
        target_multi = max(vocab_size - n_single, 0)
        drop = max(
            int(len(multi) * prune_frac), len(multi) - target_multi
        )
        kept = set(multi[drop:]) if drop > 0 else set(multi)
        t = sum(c for p, c in counts.items() if len(p) == 1 or p in kept)
        model = {
            p: round(1000 * math.log(max(counts.get(p, 0), 1) / t))
            for p in model
            if len(p) == 1 or p in kept
        }
    spark = docs.sparkSession
    return spark.createDataFrame(
        sorted(model.items()), schema="piece string, score_milli long"
    )


def unigram_doc_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pieces: dict[str, int] = DEFAULT_PIECES,
    max_piece: int = MAX_PIECE,
) -> DataFrame:
    """Per-document EXACT unigram token counts — the unigram sibling of
    ops.bpe.bpe_token_counts for the packing/budget operators: Viterbi
    runs once per DISTINCT word, the per-word counts join back to
    occurrences on the word key, and the doc rollup is one
    map-side-combined groupBy. Out-of-vocabulary words (unsegmentable
    under the model) are counted in ``n_oov`` and excluded from the
    token sum rather than nulling the document."""
    words = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where(F.col("word") != "")
    dim = (
        words.select("word")
        .distinct()
        .select(
            "word",
            _viterbi_bests(F.col("word"), pieces, max_piece).alias("__b"),
        )
        .select(
            "word",
            _viterbi_result(F.col("word"), F.col("__b"))["n_tokens"].alias(
                "_nt"
            ),
        )
    )
    joined = words.join(dim, "word")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.coalesce(F.col("_nt"), F.lit(0)).cast("long")).alias(
            "unigram_tokens"
        ),
        F.sum(F.col("_nt").isNull().cast("long")).alias("n_oov"),
    )
