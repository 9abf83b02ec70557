"""Registry queries for the preference/RLHF layer (ops/preference.py).

Scored candidate responses are synthesized deterministically from the
``documents`` table (the queries/chat.py fixture-synthesis discipline):
each document becomes one prompt (its first 8 tokens); its subsequent
consecutive 12-token windows become up to 4 candidate responses; the
score is a deterministic integer ``length(response)*1000 +
ascii(first char)`` — portable to DuckDB char-for-char, with real ties
at fixture scale so the packed-long tie-breaks are exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reader_spark.ops.preference import (
    best_of_n,
    dpo_render,
    pair_length_bias,
    preference_pairs,
)


def synth_responses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic scored-responses table from documents: prompt =
    first 8 tokens, responses = the next full 12-token windows (max 4),
    score_milli = length(response)*1000 + ascii(first char)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    # Spark's sequence(1, n) DESCENDS for n <= 0 ([1, 0], step -1) while
    # DuckDB's generate_series(1, 0) is empty — clamp short docs to an
    # explicit empty array so both engines drop them.
    n_resp = F.least(
        F.lit(4), F.expr("(size(split(text, ' ')) - 8) div 12")
    )
    seq = F.when(n_resp >= 1, F.sequence(F.lit(1), n_resp)).otherwise(
        F.array().cast("array<int>")
    )
    resp = F.concat_ws(
        " ", F.slice(F.col("__toks"), (F.col("__k") - 1) * 12 + 9, 12)
    )
    return (
        docs.select(
            F.col("doc_id").alias("prompt_id"),
            toks.alias("__toks"),
            F.posexplode(seq).alias("__p", "__k"),
        )
        .select(
            "prompt_id",
            (F.col("__k") - 1).cast("long").alias("response_id"),
            F.concat_ws(" ", F.slice(F.col("__toks"), 1, 8)).alias("prompt"),
            resp.alias("response"),
        )
        .select(
            "*",
            (
                F.length("response") * 1000
                + F.ascii(F.substring("response", 1, 1))
            )
            .cast("long")
            .alias("score_milli"),
        )
    )


def _q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chosen/rejected preference-pair election per prompt via one packed-long groupBy (ops.preference.preference_pairs)."""
    return preference_pairs(synth_responses(spark, sf_dir))


def _q_dpo_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO training rows: preference pairs joined back and chat-template rendered (ops.preference.dpo_render)."""
    return dpo_render(synth_responses(spark, sf_dir))


def _q_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-N candidate selection per prompt via a prompt-partitioned window (ops.preference.best_of_n)."""
    return best_of_n(synth_responses(spark, sf_dir), n=3)


def _q_pair_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reward-model verbosity-bias probe: chosen-vs-rejected length gap per margin bucket (ops.preference.pair_length_bias)."""
    return pair_length_bias(dpo_render(synth_responses(spark, sf_dir)))


QUERIES = {
    "preference_pairs": _q_preference_pairs,
    "dpo_render": _q_dpo_render,
    "best_of_n": _q_best_of_n,
    "pair_length_bias": _q_pair_length_bias,
}
