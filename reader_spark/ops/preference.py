"""Preference / RLHF data operators: pairwise preference construction,
DPO pair rendering, best-of-n selection, and reward length-bias probes.

The reference pipeline ends at clean per-document markdown
(src/formatters/markdown.ts); the SFT/chat layer (ops/chat.py) stacked
conversations on top. This module is the next post-training stage: given
a frame of scored candidate RESPONSES per prompt, build the
chosen/rejected pairs a DPO or reward-model trainer consumes, render
them with the chat template, and probe the corpus for verbosity bias
(the classic RLHF data-quality failure where "chosen" correlates with
"longer").

Input shape everywhere: a RESPONSES DataFrame
``(prompt_id:long, response_id:long, prompt:string, response:string,
score_milli:long)`` — one row per candidate response, ``score_milli``
an integer milli-unit reward (the repo's float-free score convention),
``response_id`` dense per prompt and < 1e6.

Scale shape (10^9 prompts x tens of candidates):
  * ``preference_pairs`` — ONE groupBy(prompt_id) with map-side combine;
    the chosen/rejected argmax/argmin ride as two packed-long
    aggregates (max/min), so the shuffle carries two longs per prompt,
    never response text.
  * ``dpo_render`` — pairs join back to responses on prompt_id and the
    groupBy reuses the join's hash partitioning (one exchange per side,
    AQE-coalesced); only the two elected responses per prompt survive
    into the rendered strings.
  * ``best_of_n`` — window partitioned BY PROMPT (bounded: candidates
    per prompt are tens, the safe window family).
  * ``pair_length_bias`` — single groupBy over the bounded
    margin-bucket dim.

Packing contract: ``packed = score_milli * 1e6 + f(response_id)`` with
``f = (1e6-1) - id`` on the max side and ``f = id`` on the min side, so
``max(packed)`` elects (max score, min id) and ``min(packed)`` elects
(min score, min id) — deterministic tie-breaks with pure integer
max/min, portable bit-for-bit to the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "preference_pairs",
    "dpo_render",
    "best_of_n",
    "pair_length_bias",
]

# response_id radix for packed (score, id) election; response_id is
# candidates-per-prompt (tens in any real RLHF corpus) — guarded below.
_RID_RADIX = 1_000_000


def preference_pairs(responses: DataFrame) -> DataFrame:
    """Chosen/rejected pair per prompt from scored candidates.

    chosen = argmax score (ties -> min response_id), rejected = argmin
    score (ties -> min response_id). Prompts whose candidates all share
    one score carry no preference signal and are dropped (margin 0).
    Returns ``(prompt_id, chosen_id, rejected_id, chosen_score,
    rejected_score, margin_milli)``.

    One groupBy(prompt_id); the shuffle carries two packed longs per
    prompt, never text.
    """
    r = F.lit(_RID_RADIX)
    guarded = responses.where(
        (F.col("response_id") >= 0)
        & (F.col("response_id") < r)
        & (F.col("score_milli") >= 0)
    )
    hi = (F.col("score_milli") * r + (r - 1 - F.col("response_id"))).cast(
        "long"
    )
    lo = (F.col("score_milli") * r + F.col("response_id")).cast("long")
    g = (
        guarded.select("prompt_id", hi.alias("hi"), lo.alias("lo"))
        .groupBy("prompt_id")
        .agg(F.max("hi").alias("mh"), F.min("lo").alias("ml"))
    )
    chosen_score = F.expr(f"mh div {_RID_RADIX}")
    rejected_score = F.expr(f"ml div {_RID_RADIX}")
    return (
        g.select(
            "prompt_id",
            (r - 1 - F.col("mh") % r).cast("long").alias("chosen_id"),
            (F.col("ml") % r).cast("long").alias("rejected_id"),
            chosen_score.cast("long").alias("chosen_score"),
            rejected_score.cast("long").alias("rejected_score"),
            (chosen_score - rejected_score).cast("long").alias("margin_milli"),
        )
        .where(F.col("margin_milli") > 0)
    )


def dpo_render(responses: DataFrame) -> DataFrame:
    """Render each preference pair into DPO training strings.

    Joins :func:`preference_pairs` back to the responses and renders
    both sides with the chat template (ops/chat.py contract):
    ``<|user|>PROMPT<|end|><|assistant|>RESPONSE<|end|>``. Returns
    ``(prompt_id, chosen_text, rejected_text, chosen_len, rejected_len,
    margin_milli)`` with the lens = response CONTENT lengths (the
    length-bias probe's input, template chars excluded).

    One join on prompt_id; the groupBy reuses the join's partitioning,
    and only the two elected candidates per prompt reach the aggregate.
    """
    pairs = preference_pairs(responses)
    j = responses.join(pairs, "prompt_id").where(
        (F.col("response_id") == F.col("chosen_id"))
        | (F.col("response_id") == F.col("rejected_id"))
    )
    rendered = F.concat(
        F.lit("<|user|>"),
        F.col("prompt"),
        F.lit("<|end|><|assistant|>"),
        F.col("response"),
        F.lit("<|end|>"),
    )
    side = F.col("response_id") == F.col("chosen_id")
    return j.groupBy("prompt_id", "margin_milli").agg(
        F.max(F.when(side, rendered)).alias("chosen_text"),
        F.max(F.when(~side, rendered)).alias("rejected_text"),
        F.max(F.when(side, F.length("response")))
        .cast("long")
        .alias("chosen_len"),
        F.max(F.when(~side, F.length("response")))
        .cast("long")
        .alias("rejected_len"),
    ).select(
        "prompt_id",
        "chosen_text",
        "rejected_text",
        "chosen_len",
        "rejected_len",
        "margin_milli",
    )


def best_of_n(responses: DataFrame, n: int = 3) -> DataFrame:
    """Top-n candidates per prompt by score (ties -> min response_id).

    Returns ``(prompt_id, response_id, score_milli, rank)`` with rank
    1-based. The window partitions by prompt — bounded partitions
    (candidates per prompt), the scale-safe window family; this is NOT
    the global-top-K antipattern.
    """
    w = Window.partitionBy("prompt_id").orderBy(
        F.col("score_milli").desc(), F.col("response_id").asc()
    )
    return (
        responses.select(
            "prompt_id",
            "response_id",
            "score_milli",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= n)
    )


def pair_length_bias(pairs: DataFrame, bucket_milli: int = 5000) -> DataFrame:
    """Verbosity-bias histogram over margin buckets.

    Input = :func:`dpo_render` output. Buckets pairs by
    ``margin_milli div bucket_milli`` and reports, per bucket,
    ``(margin_bucket, n_pairs, n_chosen_longer, chosen_longer_milli,
    mean_margin_milli)`` — ``chosen_longer_milli`` = floor(1000 *
    chosen-longer pairs / pairs). A healthy reward signal keeps
    chosen_longer_milli near 500 across buckets; a climb toward 1000
    at high margins is the classic length-bias smell (the RM is
    grading verbosity).

    Single groupBy over the bounded bucket dim.
    """
    b = pairs.select(
        F.expr(f"margin_milli div {int(bucket_milli)}")
        .cast("long")
        .alias("margin_bucket"),
        (F.col("chosen_len") > F.col("rejected_len"))
        .cast("long")
        .alias("chosen_longer"),
        "margin_milli",
    )
    return b.groupBy("margin_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("chosen_longer").cast("long").alias("n_chosen_longer"),
        F.expr("CAST((1000 * sum(chosen_longer)) div count(*) AS BIGINT)")
        .alias("chosen_longer_milli"),
        F.expr("CAST(sum(margin_milli) div count(*) AS BIGINT)")
        .alias("mean_margin_milli"),
    )
