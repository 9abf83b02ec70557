"""Vocabulary coverage accounting: how much of the corpus the top-k
most frequent types cover, at power-of-two cuts.

The tokenizer-sizing question ("is a 32k vocab enough, or does 64k
meaningfully raise coverage?") is a cumulative-frequency curve over the
type ranking. At corpus scale the vocabulary is 1e8–1e9 types, so the
ranking CANNOT be a global window — this module buckets each type by
``ceil(log2(rank))`` instead (rank from :func:`ops.rank.scalable_rank`,
the distributed row_number), folds each power-of-two bucket with one
groupBy, and cumsums over the ≤64-row bucket dim with a triangular
self-join (the scalable_rank offsets discipline — not even a
single-partition WindowExec warning).

``ceil(log2(.))`` at exact powers of two is safe across engines: IEEE
log2 is exact there (the only place a representation error could cross
an integer), so Spark and the DuckDB oracle bucket identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reader_spark.ops.rank import scalable_rank

__all__ = ["vocab_coverage"]


def vocab_coverage(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Coverage of corpus token occurrences by top-2^j type cuts.

    Whitespace-tokenizes ``text_col``, ranks types by (freq desc, token
    asc), and reports one row per power-of-two cut k = 2^j that has any
    type in its bucket: ``(k_cut, n_types, covered_occurrences,
    coverage_milli)`` — ``n_types`` = types with rank <= k,
    ``coverage_milli`` = floor(1000 * covered / total occurrences).

    Plan: explode -> ONE groupBy(token) freq fold (map-side combined)
    -> scalable_rank (range buckets, no single-partition window) ->
    bucket groupBy over the ≤64-row log2 dim -> triangular cumsum.
    """
    freqs = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    ranked = scalable_rank(
        freqs, [F.desc("freq"), F.asc("token")], rank_col="rank"
    )
    # bucket j: ranks in (2^(j-1), 2^j], with rank 1 -> j = 0 (cut k=1)
    bucket = F.when(F.col("rank") == 1, F.lit(0)).otherwise(
        F.ceil(F.log2(F.col("rank"))).cast("long")
    )
    per_bucket = (
        ranked.select(bucket.alias("j"), "freq")
        .groupBy("j")
        .agg(
            F.count(F.lit(1)).cast("long").alias("bucket_types"),
            F.sum("freq").cast("long").alias("bucket_occ"),
        )
    )
    # cumulative over the bounded bucket dim: triangular self-join
    cum = (
        per_bucket.alias("a")
        .join(
            per_bucket.alias("b"),
            F.col("b.j") <= F.col("a.j"),
            "left",
        )
        .groupBy(F.col("a.j").alias("j"))
        .agg(
            F.sum("b.bucket_types").cast("long").alias("n_types"),
            F.sum("b.bucket_occ").cast("long").alias("covered_occurrences"),
        )
    )
    total = freqs.agg(F.sum("freq").cast("long").alias("__total"))
    return (
        cum.join(F.broadcast(total))
        .select(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")
            .cast("long")
            .alias("k_cut"),
            "n_types",
            "covered_occurrences",
            F.expr("(1000 * covered_occurrences) div __total")
            .cast("long")
            .alias("coverage_milli"),
        )
    )
