"""SFT / chat-conversation operators: template rendering, loss-mask
spans, assistant-turn dedup, and conversation hygiene stats.

Modern post-training pipelines consume *conversations*, not documents:
an ordered list of (role, content) turns per conversation. The reference
pipeline stops at clean markdown (src/formatters/markdown.ts — its unit
of work is one document); this module is the layer a training pipeline
stacks on top: render the turns into one training string with a chat
template, compute which character spans of that string are trainable
(assistant content only — the loss mask), dedup assistant responses
across conversations (the SFT analog of exact doc dedup), and score
per-conversation structural hygiene (alternation, role balance,
ends-with-assistant).

Input shape everywhere: a TURNS DataFrame
``(conv_id:long, turn_idx:long, role:string, content:string)`` —
one row per turn, ``turn_idx`` dense from 0 in conversation order.
A nested ``array<struct<...>>`` column flattens to this with one
``posexplode``; keeping operators on the flat shape keeps every one of
them expressible as native Catalyst expressions (zero Python).

Scale shape (100 TB of conversations):
  * ``render_chat`` — one groupBy(conv_id) with map-side combine of
    pre-rendered per-turn strings; shuffle carries each conversation
    once, no window.
  * ``loss_mask_spans`` — window partitioned BY CONVERSATION (bounded:
    a conversation has tens of turns, never corpus-scale rows in one
    partition; this is the safe window family, unlike global orderBy).
  * ``assistant_turn_dedup`` — only (md5 digest, packed id) pairs enter
    the shuffle, never content strings: the digest-only-shuffle
    discipline from ops/multimodal.media_dedup.
  * ``chat_stats`` — single groupBy with algebraic aggregates.

Template contract (fixed, mirrored by the DuckDB oracles char-for-char):
each turn renders as ``<|ROLE|>CONTENT<|end|>`` and turns concatenate in
``turn_idx`` order with no separator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "render_chat",
    "loss_mask_spans",
    "assistant_turn_dedup",
    "chat_stats",
]

# packed (conv_id, turn_idx) key for tuple-argmin without struct
# comparisons: turn_idx is bounded far below this radix in any real
# chat corpus (guarded in assistant_turn_dedup).
_TURN_RADIX = 1_000_000


def _rendered(role: str | None = None) -> F.Column:
    """Per-turn rendered string ``<|role|>content<|end|>``."""
    role_col = F.lit(role) if role is not None else F.col("role")
    return F.concat(
        F.lit("<|"), role_col, F.lit("|>"), F.col("content"), F.lit("<|end|>")
    )


def render_chat(turns: DataFrame) -> DataFrame:
    """Render each conversation to one training string.

    Returns ``(conv_id, chat_text, n_chars, n_turns)`` with
    ``chat_text`` = the turns rendered ``<|role|>content<|end|>`` and
    concatenated in ``turn_idx`` order. The per-turn render happens
    before the shuffle (map-side), the order is restored JVM-side with
    ``array_sort`` over (turn_idx, rendered) structs — no window, one
    exchange on conv_id.
    """
    return (
        turns.select(
            "conv_id",
            F.struct(
                F.col("turn_idx").alias("i"), _rendered().alias("r")
            ).alias("t"),
        )
        .groupBy("conv_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("t")), lambda t: t["r"]
                ),
            ).alias("chat_text"),
            F.count(F.lit(1)).cast("long").alias("n_turns"),
        )
        .select(
            "conv_id",
            "chat_text",
            F.length("chat_text").cast("long").alias("n_chars"),
            "n_turns",
        )
    )


def loss_mask_spans(turns: DataFrame) -> DataFrame:
    """Character spans of each turn's CONTENT inside the rendered string.

    Returns ``(conv_id, turn_idx, role, start_char, end_char,
    trainable)`` — 0-based [start_char, end_char) offsets of the content
    (role header and ``<|end|>`` excluded) inside ``render_chat``'s
    ``chat_text``, and ``trainable`` = role == 'assistant'. This IS the
    loss mask: a trainer sums loss over trainable spans only.

    The running offset is a window partitioned by conv_id — bounded
    partitions (turns per conversation), the scale-safe window family.
    """
    rlen = F.length(_rendered())
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(rlen).over(w), F.lit(0)).cast("long")
    start = prefix + F.length(F.concat(F.lit("<|"), F.col("role"), F.lit("|>")))
    return turns.select(
        "conv_id",
        "turn_idx",
        "role",
        start.cast("long").alias("start_char"),
        (start + F.length("content")).cast("long").alias("end_char"),
        (F.col("role") == "assistant").alias("trainable"),
    )


def assistant_turn_dedup(turns: DataFrame) -> DataFrame:
    """Exact dedup of assistant responses across conversations.

    Normalizes assistant content (lowercase, whitespace collapsed,
    trimmed), groups by md5 digest, and elects the canonical copy as
    the (conv_id, turn_idx)-minimal turn. Returns one row per assistant
    turn: ``(conv_id, turn_idx, canon_conv, canon_turn, n_copies,
    is_canonical)`` — a trainer drops rows with ``is_canonical = false``
    (or downweights by n_copies).

    Only ``(digest, packed id)`` pairs cross the exchange — content
    never shuffles (the media_dedup discipline, ops/multimodal.py).
    The tuple argmin is integer min over ``conv_id * 1e6 + turn_idx``.
    """
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("content")), r"\s+", " ")
    )
    packed = (
        F.col("conv_id") * F.lit(_TURN_RADIX) + F.col("turn_idx")
    ).cast("long")
    a = turns.where(
        (F.col("role") == "assistant")
        & (F.col("turn_idx") < F.lit(_TURN_RADIX))
    ).select(
        "conv_id",
        "turn_idx",
        F.md5(norm).alias("h"),
        packed.alias("packed"),
    )
    groups = a.groupBy("h").agg(
        F.min("packed").alias("canon_packed"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )
    return a.join(groups, "h").select(
        "conv_id",
        "turn_idx",
        F.expr(f"canon_packed div {_TURN_RADIX}")
        .cast("long")
        .alias("canon_conv"),
        (F.col("canon_packed") % F.lit(_TURN_RADIX))
        .cast("long")
        .alias("canon_turn"),
        "n_copies",
        (F.col("packed") == F.col("canon_packed")).alias("is_canonical"),
    )


def chat_stats(turns: DataFrame) -> DataFrame:
    """Per-conversation structural hygiene for SFT filtering.

    Returns ``(conv_id, n_turns, n_user, n_assistant, starts_with_user,
    ends_with_assistant, alternates, assistant_char_milli)``:
    ``alternates`` = no two consecutive turns share a role;
    ``assistant_char_milli`` = floor(1000 * assistant content chars /
    total content chars) — integer milli-units, the repo's float-free
    ratio convention. One lag window (bounded per-conversation
    partitions) + one groupBy.
    """
    lag_role = F.lag("role").over(
        Window.partitionBy("conv_id").orderBy("turn_idx")
    )
    t = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        F.length("content").cast("long").alias("clen"),
        F.when(F.col("role") == lag_role, F.lit(1))
        .otherwise(F.lit(0))
        .alias("same_as_prev"),
    )
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("long")
        .alias("n_assistant"),
        (F.min_by("role", "turn_idx") == F.lit("user")).alias(
            "starts_with_user"
        ),
        (F.max_by("role", "turn_idx") == F.lit("assistant")).alias(
            "ends_with_assistant"
        ),
        (F.sum("same_as_prev") == F.lit(0)).alias("alternates"),
        F.expr(
            "CAST((1000 * sum(CASE WHEN role = 'assistant' THEN clen "
            "ELSE 0 END)) div greatest(sum(clen), 1) AS BIGINT)"
        ).alias("assistant_char_milli"),
    )
