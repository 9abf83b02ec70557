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


QUERIES = {
    "chat_render": _q_chat_render,
    "chat_loss_masks": _q_chat_loss_masks,
    "chat_turn_dedup": _q_chat_turn_dedup,
    "chat_stats": _q_chat_stats,
}
