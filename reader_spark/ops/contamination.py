"""Synthetic-text contamination scanning: find LLM output that leaked
into a pretraining corpus.

Web crawls after 2023 contain model-generated text — chat-template
tokens pasted with copied answers, "as an AI language model"
boilerplate, refusal strings — and training on it both degrades models
(the self-consuming-loop effect, Shumailov et al. 2023 "The Curse of
Recursion"; Alemohammad et al. 2023 MAD) and teaches parroted refusals.
This module is the scan the curation funnel runs before quality
scoring: per-document marker flags plus the per-source contamination
profile that decides which feeds get cut.

Marker families (case-insensitive substring dims, broadcast literals):
  * chat-template tokens — serialization artifacts of common formats
    (ChatML, Llama INST, Alpaca headers) that never occur in organic
    text;
  * AI self-reference boilerplate;
  * refusal-prefix strings.

Scale shape: flags are pure ``contains`` columns riding the scan (zero
shuffle — plan-pinned); the profile is ONE map-side-combined groupBy
over the bounded source dim carrying four counters. All fractions are
integer milli-units.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "synthetic_text_scan",
    "synthetic_contamination_profile",
    "CHAT_TEMPLATE_MARKERS",
    "AI_SELFREF_MARKERS",
    "REFUSAL_MARKERS",
]

CHAT_TEMPLATE_MARKERS: tuple[str, ...] = (
    "<|im_start|>",
    "<|im_end|>",
    "<|endoftext|>",
    "[inst]",
    "[/inst]",
    "### instruction:",
    "### response:",
    "<|assistant|>",
    "<|user|>",
)

AI_SELFREF_MARKERS: tuple[str, ...] = (
    "as an ai language model",
    "as a large language model",
    "i am an ai ",
    "i'm an ai ",
)

REFUSAL_MARKERS: tuple[str, ...] = (
    "i cannot assist with",
    "i can't assist with",
    "i'm sorry, but i can",
    "i am sorry, but i can",
)


def _any_marker(low: Column, markers: tuple[str, ...]) -> Column:
    pred = None
    for m in markers:
        c = F.contains(low, F.lit(m))
        pred = c if pred is None else pred | c
    return pred


def synthetic_text_scan(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document marker flags: ``(id, has_chat_template,
    has_ai_selfref, has_refusal, contaminated)``.

    Pure map over the scan — no shuffle; marker dims are literal
    broadcast constants.
    """
    low = F.lower(F.col(text_col))
    t = _any_marker(low, CHAT_TEMPLATE_MARKERS)
    s = _any_marker(low, AI_SELFREF_MARKERS)
    r = _any_marker(low, REFUSAL_MARKERS)
    return df.select(
        F.col(id_col),
        t.alias("has_chat_template"),
        s.alias("has_ai_selfref"),
        r.alias("has_refusal"),
        (t | s | r).alias("contaminated"),
    )


def synthetic_contamination_profile(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group contamination accounting: ``(<group_col>, n_docs,
    n_chat_template, n_ai_selfref, n_refusal, contaminated_milli)`` —
    the table that decides which feeds get cut from the crawl."""
    low = F.lower(F.col(text_col))
    t = _any_marker(low, CHAT_TEMPLATE_MARKERS).cast("long")
    s = _any_marker(low, AI_SELFREF_MARKERS).cast("long")
    r = _any_marker(low, REFUSAL_MARKERS).cast("long")
    flagged = df.select(
        F.col(group_col).alias("__g"),
        t.alias("__t"),
        s.alias("__s"),
        r.alias("__r"),
        F.greatest(t, s, r).alias("__c"),
    )
    return (
        flagged.groupBy("__g")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("n_chat_template"),
            F.sum("__s").cast("long").alias("n_ai_selfref"),
            F.sum("__r").cast("long").alias("n_refusal"),
            F.expr("(sum(__c) * 1000) div count(*)")
            .cast("long")
            .alias("contaminated_milli"),
        )
        .withColumnRenamed("__g", group_col)
    )
