"""Registry queries for the arena / rating layer (ops/arena.py) and
the BTE extraction arm (ops/bte.py).

Battles are synthesized deterministically from the ``documents`` table
(the evals.py fixture-synthesis discipline): each document is one
judged comparison between two of six models; the winner is decided by
an integer congruence biased by a linear skill ladder, so Bradley-Terry
genuinely recovers the ladder and every model wins somewhere (the MM
support condition). Rater labels and BTE token streams come from the
same table with pure-arithmetic decoration, so the DuckDB oracles
rebuild identical inputs with no side-channel data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def synth_battles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One battle per document over six models m0..m5 with skill
    100 + 120*i: first slot a = doc_id % 6, second slot b =
    (doc_id div 6) % 6 bumped off the diagonal; win_a iff
    (doc_id * 37 + 11 * a) % (skill_a + skill_b) < skill_a."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    a = F.col("doc_id") % 6
    b0 = F.expr("doc_id div 6") % 6
    b = F.when(b0 == a, (b0 + 1) % 6).otherwise(b0)
    sk_a = 100 + 120 * a
    sk_b = 100 + 120 * b
    return docs.select(
        "doc_id",
        F.concat(F.lit("m"), a.cast("string")).alias("model_a"),
        F.concat(F.lit("m"), b.cast("string")).alias("model_b"),
        F.concat(F.lit("j"), (F.col("doc_id") % 4).cast("string")).alias(
            "judge"
        ),
        (
            (F.col("doc_id") * 37 + 11 * a) % (sk_a + sk_b) < sk_a
        ).cast("int").alias("win_a"),
    )


def synth_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three raters per document labelling four quality categories with
    structured disagreement ((doc_id + r) % 5 == 0 bumps the label);
    every 41st document gets a fourth rater so the constant-rater
    filter and ``n_items_dropped`` are exercised."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n_raters = F.when(F.col("doc_id") % 41 == 0, 4).otherwise(3)
    lab = docs.select(
        F.col("doc_id").alias("item_id"),
        F.explode(F.sequence(F.lit(0), n_raters - 1)).alias("r"),
    )
    cat = (
        F.col("item_id") % 4
        + F.when((F.col("item_id") + F.col("r")) % 5 == 0, 1).otherwise(0)
    ) % 4
    return lab.select(
        "item_id",
        F.concat(F.lit("r"), F.col("r").cast("string")).alias("rater_id"),
        F.concat(F.lit("c"), cat.cast("string")).alias("category"),
    )


def synth_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BTE token stream: document words in order, decorated with a
    leading tag run (doc_id % 6 tokens), a trailing tag run
    (doc_id % 4 tokens) and interior tag noise ((doc_id + tok_no) % 7
    == 0) — the boilerplate-brackets-body shape BTE assumes."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("tok_no", "token"),
        F.size(F.split("text", " ")).alias("n_toks"),
    )
    is_tag = (
        (F.col("tok_no") < F.col("doc_id") % 6)
        | (F.col("tok_no") >= F.col("n_toks") - F.col("doc_id") % 4)
        | ((F.col("doc_id") + F.col("tok_no")) % 7 == 0)
    ).cast("int")
    return toks.select(
        "doc_id",
        F.col("tok_no").cast("long").alias("tok_no"),
        "token",
        is_tag.alias("is_tag"),
    )


def _q_arena_bt_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry arena ratings via 3 unrolled integer MM updates
    (ops.arena.bt_ratings, Hunter 2004): battles reduce to the bounded
    model-pair dim, every iteration joins that dim to the broadcast
    ratings dim, ratings anchored to the lexicographically-first
    model."""
    from reader_spark.ops.arena import bt_ratings

    return bt_ratings(synth_battles(spark, sf_dir), iters=3)


def _q_arena_win_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed head-to-head win matrix with milli-unit win rates
    (ops.arena.win_matrix): one map-side-combined groupBy to the
    model-pair dim."""
    from reader_spark.ops.arena import win_matrix

    return win_matrix(synth_battles(spark, sf_dir))


def _q_arena_position_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-judge first-position win rate (ops.arena.position_bias,
    Zheng et al. 2023) — the LLM-judge order-bias probe."""
    from reader_spark.ops.arena import position_bias

    return position_bias(synth_battles(spark, sf_dir))


def _q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa inter-rater agreement over synthesized 3-rater
    labels (ops.arena.fleiss_kappa, Fleiss 1971): exact BIGINT moment
    sums, kappa as one exactly-rounded IEEE division; variable-rater
    items dropped and counted."""
    from reader_spark.ops.arena import fleiss_kappa

    return fleiss_kappa(synth_labels(spark, sf_dir))


def _q_bte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BTE optimal extraction window per document (ops.bte.bte_window,
    Finn et al. 2001) in O(n) prefix-sum/Kadane form: one doc_id
    exchange, packed-long elections, integer end-to-end."""
    from reader_spark.ops.bte import bte_window

    return bte_window(synth_tokens(spark, sf_dir))


def _q_bte_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extracted BTE body text per document (ops.bte.bte_extract): word
    tokens inside the elected window, space-joined in stream order."""
    from reader_spark.ops.bte import bte_extract

    return bte_extract(synth_tokens(spark, sf_dir))


def _q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) over the rater labels with
    deterministic rater dropout (ops.arena.krippendorff_alpha,
    Krippendorff 2004): variable-rater items are KEPT (the
    fleiss_kappa contrast); single-rated items dropped and counted;
    LCM-scaled exact integer disagreement sums."""
    from reader_spark.ops.arena import krippendorff_alpha

    lab = synth_labels(spark, sf_dir)
    item, rater = F.col("item_id"), F.col("rater_id")
    lab = lab.where(
        ~((item % 53 == 0) & (rater != "r0"))
        & ~((item % 37 == 0) & (rater == "r2"))
    )
    return krippendorff_alpha(lab)


QUERIES = {
    "arena_bt_ratings": _q_arena_bt_ratings,
    "arena_win_matrix": _q_arena_win_matrix,
    "arena_position_bias": _q_arena_position_bias,
    "fleiss_kappa": _q_fleiss_kappa,
    "krippendorff_alpha": _q_krippendorff_alpha,
    "bte_window": _q_bte_window,
    "bte_extract": _q_bte_extract,
}
