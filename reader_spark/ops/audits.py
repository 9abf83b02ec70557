"""Input-hygiene audits: embedding-column health and declared-vs-
detected language consistency.

Vector pipelines fail silently — a NaN component poisons every cosine
downstream, a zero vector lands in whichever ANN cell divides by its
norm first, a dimension mismatch turns zip_with into silent
truncation. And metadata lies: feeds mislabel language, which poisons
stopword-dependent quality scoring and per-language mixes. These two
audits are the ingest gates a vector/multilingual corpus runs before
any operator trusts the columns.

Scale shape: both are ONE aggregate. The embedding audit folds every
per-vector predicate within the row (scan-bound) and aggregates exact
integers (norm2 in KILO micro^2-units so 10^9 vectors can't overflow
the sum); the language audit is a groupBy over the bounded source dim
reusing ops/textstats.detect_language_col (native argmax over the
stopword-vote struct — no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reader_spark.ops.textstats import detect_language_col

__all__ = ["embedding_quality_audit", "lang_mismatch_audit"]


def embedding_quality_audit(
    embeds: DataFrame,
    expected_dim: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row corpus audit of an embedding column.

    ``(n_vectors, n_null_vec, n_nan_vec, n_zero_vec, n_dim_bad,
    min_norm2_kilo, max_norm2_kilo, mean_norm2_kilo)`` — norms are
    exact integer squared-L2 over micro-quantized components, reported
    in kilo-units (``div 1024``; non-negative, trunc == floor). NULL /
    NaN / wrong-dim vectors are excluded from the norm stats (their
    norms are meaningless), zero vectors included (their norm IS the
    finding).
    """
    fv = F.col(vec_col).cast("array<double>")
    is_null = fv.isNull()
    dim_bad = ~is_null & (F.size(fv) != expected_dim)
    has_nan = ~is_null & (
        F.size(F.filter(fv, lambda x: F.isnan(x))) > 0
    )
    healthy = ~is_null & ~dim_bad & ~has_nan
    q = F.transform(fv, lambda x: F.round(x * 1_000_000).cast("long"))
    norm2 = F.aggregate(
        q, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    is_zero = healthy & (norm2 == 0)
    flags = embeds.select(
        is_null.cast("long").alias("f_null"),
        dim_bad.cast("long").alias("f_dim"),
        has_nan.cast("long").alias("f_nan"),
        is_zero.cast("long").alias("f_zero"),
        F.when(healthy, norm2).alias("n2"),
    ).select(
        "f_null",
        "f_dim",
        "f_nan",
        "f_zero",
        F.expr("n2 div 1024").alias("nk"),
    )
    return flags.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.sum("f_null").cast("long").alias("n_null_vec"),
        F.sum("f_nan").cast("long").alias("n_nan_vec"),
        F.sum("f_zero").cast("long").alias("n_zero_vec"),
        F.sum("f_dim").cast("long").alias("n_dim_bad"),
        F.min("nk").cast("long").alias("min_norm2_kilo"),
        F.max("nk").cast("long").alias("max_norm2_kilo"),
        F.expr("sum(nk) div greatest(count(nk), 1)")
        .cast("long")
        .alias("mean_norm2_kilo"),
    )


def lang_mismatch_audit(
    docs: DataFrame,
    group_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group declared-vs-detected language accounting.

    ``(<group_col>, n_docs, n_mismatch, n_undetected,
    mismatch_milli)`` — a mismatch is ``detected != declared`` with
    POSITIVE stopword evidence (``detected != 'und'``); no-evidence
    docs count separately (they are short/odd, not mislabeled).
    """
    det = detect_language_col(F.col(text_col))
    flags = docs.select(
        F.col(group_col).alias("__g"),
        ((det != F.col(lang_col)) & (det != "und"))
        .cast("long")
        .alias("__m"),
        (det == "und").cast("long").alias("__u"),
    )
    return (
        flags.groupBy("__g")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__m").cast("long").alias("n_mismatch"),
            F.sum("__u").cast("long").alias("n_undetected"),
            F.expr("(sum(__m) * 1000) div count(*)")
            .cast("long")
            .alias("mismatch_milli"),
        )
        .withColumnRenamed("__g", group_col)
    )
