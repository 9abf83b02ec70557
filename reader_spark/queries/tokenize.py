"""Exact-BPE tokenizer queries (ops/bpe.py) — the trained-tokenizer-exact
token accounting the packing / budget ops consume.

Each function is a queries() entry; the DuckDB twins in
reader_spark/oracles.py are generated from the SAME literal merge table
(ops.bpe.DEFAULT_MERGES), so Spark and the oracle run one tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reader_spark.ops.bpe import bpe_encode_words, bpe_token_counts


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BPE token counts per document (literal 40-merge table,
    JVM-side chained replaces — no Python, no shuffle: the count is a
    within-row fold riding the scan). n_words / fertility ride along for
    the tokenizer-health read (fertility ~1 on in-vocab English, ~word
    length on out-of-vocab strings)."""
    return bpe_token_counts(_read(spark, sf_dir, "documents"))


def _q_bpe_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing budgeted by the EXACT BPE count instead of the
    whitespace proxy — pack_by_cost consuming bpe_token_counts' column
    (the r4 verdict's composition ask). Per-shard windows (doc_id % 8),
    the production no-global-window shape."""
    from reader_spark.ops.packing import pack_by_cost

    docs = _read(spark, sf_dir, "documents")
    counts = bpe_token_counts(docs).select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(8)).cast("long").alias("shard"),
        "bpe_tokens",
    )
    return pack_by_cost(
        counts, "doc_id", "bpe_tokens", 512, partition_cols=["shard"]
    )


def _q_bpe_encode_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual segmentation (not just counts) over a deterministic
    doc slice: one row per word occurrence with its space-joined BPE
    token string — certifies merge ORDER and greedy-pass semantics
    against the DuckDB twin, the strongest equality the tokenizer can
    state."""
    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 25)
    enc = bpe_encode_words(docs)
    return enc.select(
        "doc_id", "word", F.array_join("tokens", " ").alias("token_str")
    )


def _q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING: 12 merge rounds over the
    distinct-word frequency dim (pair count -> TakeOrdered(1) argmax ->
    literal-replace apply). The oracle is the same 12 rounds as unrolled
    MATERIALIZED CTEs, so rank order, tie-breaks, and pair counts are
    all certified — training, not just encoding, runs on the engine."""
    from reader_spark.ops.bpe import learn_bpe_merges

    return learn_bpe_merges(_read(spark, sf_dir, "documents"), n_merges=12)


def _bpe_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return bpe_token_counts(docs).select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(8)).cast("long").alias("shard"),
        "bpe_tokens",
    )


def _q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batch assembly over exact BPE costs: per-shard
    (cost desc, id) rank chunked into batches of 8, with per-batch
    padding accounting — the dynamic-batching step of a trainer's data
    loader, as one window + one keyed aggregate."""
    from reader_spark.ops.packing import length_grouped_batches

    return length_grouped_batches(
        _bpe_costs(spark, sf_dir),
        "doc_id",
        "bpe_tokens",
        batch_size=8,
        partition_cols=["shard"],
    )


def _q_batch_padding_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The why-length-group scorecard: total padded cost under
    length-grouped vs id-ordered batching, same shards and batch size —
    two rows, waste_frac quantifying the padding saved."""
    from reader_spark.ops.packing import batch_padding_compare

    return batch_padding_compare(
        _bpe_costs(spark, sf_dir),
        "doc_id",
        "bpe_tokens",
        batch_size=8,
        partition_cols=["shard"],
    )


def _q_nextfit_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-level NO-split packing (documents never cross sequence
    boundaries): next-fit bins per shard over exact BPE costs,
    capacity 512; oversized docs take a bin alone. Sequential recurrence
    as Arrow-batched applyInPandas per shard; the oracle is the same
    recurrence as a DuckDB recursive CTE."""
    from reader_spark.ops.packing import pack_next_fit

    return pack_next_fit(
        _bpe_costs(spark, sf_dir),
        "doc_id",
        "bpe_tokens",
        capacity=512,
        partition_cols=["shard"],
    )


QUERIES = {
    "bpe_token_counts": _q_bpe_token_counts,
    "bpe_sequence_packing": _q_bpe_sequence_packing,
    "bpe_encode_sample": _q_bpe_encode_sample,
    "bpe_learn_merges": _q_bpe_learn_merges,
    "length_batches": _q_length_batches,
    "batch_padding_compare": _q_batch_padding_compare,
    "nextfit_packing": _q_nextfit_packing,
}


def _q_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM Viterbi encode (ops.unigram, Kudo 2018) over the
    distinct-word dim: per word, the max-score segmentation under the
    literal integer milli-log model — score, token count and the piece
    sequence. The DP is a within-row fold (bounded by word length);
    the oracle twin runs the same DP as a recursive CTE. Fold runs
    once per DISTINCT word."""
    from reader_spark.ops.unigram import unigram_encode_words

    docs = _read(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )
    return unigram_encode_words(words)


def _q_unigram_em_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram hard-EM E-step + integer M-step (ops.unigram): Viterbi
    piece counts weighted by corpus word frequency, re-normalized to
    exact micro-unit probabilities (p_micro = count * 1e6 DIV total).
    Two bounded shuffles (word freq, piece counts); the normalizer is
    the documented 1-row broadcast dim."""
    from reader_spark.ops.unigram import unigram_em_counts

    return unigram_em_counts(_read(spark, sf_dir, "documents"))


QUERIES["unigram_encode"] = _q_unigram_encode
QUERIES["unigram_em_counts"] = _q_unigram_em_counts


def _q_unigram_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc exact unigram token counts (ops.unigram.
    unigram_doc_tokens): Viterbi once per DISTINCT word, word-keyed
    join back, ONE doc rollup — the unigram twin of bpe_token_counts
    for packing/budget accounting."""
    from reader_spark.ops.unigram import unigram_doc_tokens

    return unigram_doc_tokens(_read(spark, sf_dir, "documents"))


QUERIES["unigram_doc_tokens"] = _q_unigram_doc_tokens


def _q_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match encode (ops.wordpiece, Schuster
    2012 / BERT) over the distinct-word dim: per word, the piece
    sequence with ## continuation prefixes, or [UNK] when the walk
    dies (non-alpha char) or the word exceeds max_word. The fold is
    within-row (<= max_word steps); the oracle twin runs the same
    greedy walk as a recursive CTE."""
    from reader_spark.ops.wordpiece import wordpiece_encode_words

    docs = _read(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )
    return wordpiece_encode_words(words)


def _q_wordpiece_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc exact WordPiece token counts (ops.wordpiece.
    wordpiece_doc_tokens): greedy fold once per DISTINCT word,
    word-keyed join back, ONE doc rollup — completes the per-doc
    exact-token-accounting trio (bpe_token_counts,
    unigram_doc_tokens) the packing/budget operators consume."""
    from reader_spark.ops.wordpiece import wordpiece_doc_tokens

    return wordpiece_doc_tokens(_read(spark, sf_dir, "documents"))


QUERIES["wordpiece_encode"] = _q_wordpiece_encode
QUERIES["wordpiece_doc_tokens"] = _q_wordpiece_doc_tokens


def _q_tokenizer_fertility_trio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide fertility scorecard across all three trained-
    tokenizer families (BPE / unigram-LM / WordPiece) on the same
    documents table: per family, total words under ITS OWN
    pre-tokenizer, total tokens, OOV count, and fertility in exact
    milli-units (tokens*1000 div words) — the side-by-side read a
    tokenizer selection needs. Three scan-bound doc rollups, each the
    already-certified per-doc op; no new shuffle shapes."""
    from pyspark.sql import Column
    from reader_spark.ops.unigram import unigram_doc_tokens
    from reader_spark.ops.wordpiece import wordpiece_doc_tokens

    docs = _read(spark, sf_dir, "documents")

    def roll(per_doc: DataFrame, tok_col: str, oov: Column | None,
             name: str) -> DataFrame:
        agg = per_doc.agg(
            F.sum("n_words").alias("n_words"),
            F.sum(tok_col).alias("n_tokens"),
            (F.sum(oov) if oov is not None
             else F.lit(0)).cast("long").alias("n_oov"),
        )
        return agg.select(
            F.lit(name).alias("tokenizer"),
            "n_words", "n_tokens", "n_oov",
            F.when(
                F.col("n_words") > 0,
                F.expr("n_tokens * 1000 div n_words"),
            ).cast("long").alias("fertility_milli"),
        )

    bpe = roll(bpe_token_counts(docs), "bpe_tokens", None, "bpe")
    uni = roll(
        unigram_doc_tokens(docs), "unigram_tokens", F.col("n_oov"),
        "unigram",
    )
    wp = roll(
        wordpiece_doc_tokens(docs), "wp_tokens", F.col("n_unk"),
        "wordpiece",
    )
    return bpe.unionByName(uni).unionByName(wp)


QUERIES["tokenizer_fertility_trio"] = _q_tokenizer_fertility_trio
