"""Registry queries for the SFT / chat-conversation layer (ops/chat.py).

Conversations are synthesized deterministically from the ``documents``
table (the evals.py fixture-synthesis discipline): each document becomes
one conversation, its consecutive 8-token windows become alternating
user/assistant turns (at most 6). The DuckDB oracles rebuild the
identical turns with ``string_split`` + ``generate_series`` slicing, so
every operator downstream is verified end-to-end against the same
deterministic corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reader_spark.ops.chat import (
    assistant_turn_dedup,
    chat_stats,
    loss_mask_spans,
    render_chat,
)


def synth_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic turns table from documents: doc -> conversation,
    consecutive 8-token windows -> alternating user/assistant turns
    (at most 6 turns per conversation). The testdata corpus has no
    sentence punctuation, so token windows are the segmentation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    n_turns = F.least(F.lit(6), F.expr("(size(split(text, ' ')) + 7) div 8"))
    return (
        docs.select(
            F.col("doc_id").alias("conv_id"),
            toks.alias("__toks"),
            F.posexplode(F.sequence(F.lit(1), n_turns)).alias("__p", "__i"),
        )
        .select(
            "conv_id",
            (F.col("__i") - 1).cast("long").alias("turn_idx"),
            F.when((F.col("__i") - 1) % 2 == 0, "user")
            .otherwise("assistant")
            .alias("role"),
            F.concat_ws(
                " ",
                F.slice(F.col("__toks"), (F.col("__i") - 1) * 8 + 1, 8),
            ).alias("content"),
        )
    )


def _q_chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering of synthesized conversations (ops.chat.render_chat)."""
    return render_chat(synth_turns(spark, sf_dir))


def _q_chat_loss_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assistant-only loss-mask spans over rendered conversations (ops.chat.loss_mask_spans)."""
    return loss_mask_spans(synth_turns(spark, sf_dir))


def _q_chat_turn_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-conversation exact dedup of assistant turns (ops.chat.assistant_turn_dedup)."""
    return assistant_turn_dedup(synth_turns(spark, sf_dir))


def _q_chat_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation turn/role/length statistics (ops.chat.chat_stats)."""
    return chat_stats(synth_turns(spark, sf_dir))




def synth_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reply forest from documents: ternary trees in
    13-wide doc_id blocks (local 0 is the root; parent of local L is
    local (L-1) div 3; depth <= 3), plus dangling-parent orphans at
    doc_id % 101 == 7 — doc 209 (local 1) has children, so one orphan
    truncates a whole subtree, not just itself."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    local = F.col("doc_id") % 13
    parent = (
        F.when(F.col("doc_id") % 101 == 7, F.col("doc_id") + 500000)
        .when(local == 0, F.lit(None).cast("long"))
        .otherwise(F.col("doc_id") - local + F.expr("((doc_id % 13) - 1) div 3"))
    )
    return docs.select(
        F.col("doc_id").alias("msg_id"),
        parent.cast("long").alias("parent_id"),
        F.when(F.col("doc_id") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.substring("text", 1, 40).alias("text"),
    )


def _q_thread_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reply-forest flattening to root-to-leaf chains via pointer
    doubling (ops.threads.thread_chains, Wyllie 1979 list ranking):
    each leaf closes one conversation; orphan subtrees surface as
    truncated chains instead of vanishing."""
    from reader_spark.ops.threads import thread_chains

    return thread_chains(synth_forest(spark, sf_dir), max_depth=16)


QUERIES = {
    "chat_render": _q_chat_render,
    "chat_loss_masks": _q_chat_loss_masks,
    "chat_turn_dedup": _q_chat_turn_dedup,
    "chat_stats": _q_chat_stats,
    "thread_chains": _q_thread_chains,
}
