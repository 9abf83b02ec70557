"""Training-data attribution by lexical overlap: for each eval item,
rank the training documents most likely to have taught the answer.

The audit question behind decontamination is binary (is the eval item
IN the corpus?); the attribution question is graded — WHICH documents
share enough n-gram evidence with an eval item to explain a model
getting it right (the lexical baseline every influence-function paper
compares against, e.g. Akyurek et al. 2022 "Towards Tracing Factual
Knowledge in Language Models Back to the Training Data"). This op is
that baseline at corpus scale: shared distinct word-n-gram counts,
boilerplate-guarded, top-k per eval item.

Scale shape (10^12 training docs x 10^4 eval items):
  * both sides shingle to DISTINCT word n-grams (each shared TYPE
    credits once — token multiplicity would let one repeated slogan
    dominate);
  * a max-df stop-n-gram guard (the ops/winnow.py discipline) drops
    n-grams appearing in more than ``max_df`` training docs BEFORE the
    join — boilerplate n-grams otherwise fan out to the whole corpus;
  * the eval side is small by contract (10^3-10^5 items), so its
    exploded grams BROADCAST: the train side flows through one scan
    with no shuffle until the already-candidate-sized (eval_id,
    doc_id) count; the df guard is likewise an anti-join against the
    small hot-gram set, not an equi-join against the huge rare-gram
    keep-set;
  * then a top-k window partitioned by eval item (the
    bounded-partition family: candidates per item are max_df-bounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["word_ngrams", "eval_attribution"]


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct lowercase word n-grams of ``text`` (within-row)."""
    words = F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda w: w != ""
    )
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.when(k > 0, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def eval_attribution(
    train: DataFrame,
    evals: DataFrame,
    n: int = 3,
    k: int = 5,
    max_df: int = 1000,
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k training docs per eval item by shared distinct n-grams.

    Returns ``(eval_id, doc_id, shared_ngrams, rank)`` — rank 1 is the
    strongest lexical-evidence doc; ties break to the smaller doc_id.
    N-grams occurring in more than ``max_df`` training docs are
    boilerplate and never enter the join.
    """
    if n < 1 or k < 1 or max_df < 1:
        raise ValueError(f"n, k, max_df must be >= 1, got {(n, k, max_df)}")
    # Lazy reuse barrier (the ops/dsir.py discipline): the exploded gram
    # stream feeds BOTH the df-guard aggregate and the candidate join;
    # without the barrier the corpus is shingled twice (regex split +
    # n-gram render are the scan's dominant cost).
    tg = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
    ).localCheckpoint(eager=False)
    # Inverted df guard: instead of equi-joining tg against the HUGE
    # keep-set (every rare n-gram), anti-join it against the small
    # stop-set — grams in more than max_df docs are boilerplate and few
    # (<= distinct grams / max_df in the adversarial worst case; a
    # handful in practice).  The guard count combines map-side, and the
    # anti-join broadcasts under AQE, so the corpus-side explode is
    # never shuffled for the guard.
    hot = (
        tg.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") > max_df)
        .select("g")
    )
    tg = tg.join(F.broadcast(hot), "g", "left_anti")
    eg = evals.select(
        F.col(eval_id_col).alias("eval_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
    )
    # The eval side is 10^3-10^5 items by contract (module docstring) —
    # its exploded grams broadcast, so the 10^12-doc train side flows
    # through ONE scan with no shuffle until the (eval_id, doc_id)
    # count, whose input is already candidate-sized.
    shared = (
        tg.join(F.broadcast(eg), "g")
        .groupBy("eval_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_ngrams"))
    )
    w = Window.partitionBy("eval_id").orderBy(
        F.desc("shared_ngrams"), F.asc("doc_id")
    )
    return (
        shared.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "eval_id",
            "doc_id",
            "shared_ngrams",
            F.col("rank").cast("long").alias("rank"),
        )
    )
