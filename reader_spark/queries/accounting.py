"""Registry queries for training-budget accounting: epoch-schedule
mix audit (ops/allocate.epoch_schedule) and vocabulary coverage curves
(ops/vocab.vocab_coverage).

The domain dim is synthesized deterministically from the ``documents``
table: domain = source, available_tokens = whitespace token sum, target
weight = ``100 * (1 + source_index % 4)`` — a skewed mix so some
domains land over the 4-epoch repetition cap at the fixed 150k-token
budget (sf0.01's corpus is ~50k tokens, so the audit exercises all
three regimes: under 1 epoch, repeated, over-cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reader_spark.ops.allocate import epoch_schedule
from reader_spark.ops.vocab import vocab_coverage

BUDGET_TOKENS = 150_000


def _synth_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.groupBy(F.col("source").alias("domain"))
        .agg(
            F.sum(F.size(F.split("text", " ")))
            .cast("long")
            .alias("available_tokens")
        )
        .withColumn(
            "weight",
            (
                100
                * (1 + F.substring("domain", 4, 10).cast("long") % 4)
            ).cast("long"),
        )
    )


def _q_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain epoch/unique/repeated token audit for a target mix under the 4-epoch repetition cap (ops.allocate.epoch_schedule)."""
    return epoch_schedule(_synth_domains(spark, sf_dir), BUDGET_TOKENS)


def _q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step DoReMi reweight (ops/allocate.doremi_reweight, Xie et
    al. 2023) over the source-domain dim: proxy loss synthesized as
    ``2000 + (available_tokens % 7) * 400`` milli-nats against a flat
    2600 reference, so some domains clamp to zero excess and others
    spread across the fixed-point exp range."""
    from reader_spark.ops.allocate import doremi_reweight

    d = _synth_domains(spark, sf_dir).select(
        "domain",
        (2000 + (F.col("available_tokens") % 7) * 400)
        .cast("long")
        .alias("proxy_loss_milli"),
        F.lit(2600).cast("long").alias("ref_loss_milli"),
    )
    return doremi_reweight(d)


def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative top-2^j vocabulary type-coverage curve without a global window (ops.vocab.vocab_coverage)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return vocab_coverage(docs)


def _q_bootstrap_len_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI of mean doc length per source
    (ops/bootstrap.bootstrap_mean_ci, Chamandy et al. 2012): 32
    deterministic md5-seeded Poisson(1) replicates in one scan."""
    from reader_spark.ops.bootstrap import bootstrap_mean_ci

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bootstrap_mean_ci(
        docs, value_col="n_chars", group_col="source", key_col="doc_id"
    )


def _q_mix_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-scheduled batch order for the synthesized domain mix
    (ops/interleave.mix_schedule, Waldspurger & Weihl 1995): the first
    500 steps of the deterministic data-loader schedule."""
    from reader_spark.ops.interleave import mix_schedule

    d = _synth_domains(spark, sf_dir).select(
        "domain", F.col("weight").alias("weight_milli")
    )
    return mix_schedule(d, n_steps=500)


def _quasi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "lang", "source", F.expr("n_chars div 100").alias("len_bucket")
    )


def _q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity of the (lang, source, length-bucket) quasi-identifier
    combination (ops/privacy.k_anonymity_audit, Sweeney 2002)."""
    from reader_spark.ops.privacy import k_anonymity_audit

    return k_anonymity_audit(
        _quasi_docs(spark, sf_dir), ["lang", "source", "len_bucket"], k=5
    )


def _q_k_anonymity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row k-anonymity release-gate summary over the quasi-identifier audit (ops.privacy.k_anonymity_summary)."""
    from reader_spark.ops.privacy import k_anonymity_summary

    return k_anonymity_summary(
        _quasi_docs(spark, sf_dir), ["lang", "source", "len_bucket"], k=5
    )


QUERIES = {
    "epoch_schedule": _q_epoch_schedule,
    "vocab_coverage": _q_vocab_coverage,
    "doremi_weights": _q_doremi_weights,
    "bootstrap_len_ci": _q_bootstrap_len_ci,
    "mix_schedule": _q_mix_schedule,
    "k_anonymity_audit": _q_k_anonymity_audit,
    "k_anonymity_summary": _q_k_anonymity_summary,
}
