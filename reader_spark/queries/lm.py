"""Language-model scoring queries (Kneser-Ney family): the smoothing
the CCNet/KenLM quality filter actually uses, next to the certified
add-1 unigram/bigram rows. Oracles live in reader_spark/oracles.py
under the same keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

KN_DISCOUNT_MILLI = 750


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document interpolated Kneser-Ney bigram cross-entropy
    (ops.kneser.kneser_ney_scores; Kneser & Ney 1995, Chen & Goodman
    1999 eq. 4.27, the CCNet filter's smoothing family): absolute
    discount D=0.75 with the continuation-count backoff, probabilities
    formed as exact integer ratios, per-term round-9 nano-unit sums and
    an integer 6 dp reduction. Four map-side-combined n-gram groupBys +
    key-bounded scoring joins; the type-count scalar is a 1-row
    broadcast dim."""
    from reader_spark.ops.kneser import kneser_ney_scores

    docs = _read(spark, sf_dir, "documents")
    return kneser_ney_scores(docs, discount_milli=KN_DISCOUNT_MILLI)


def _q_kneser_ney_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level KN fluency rollup (ops.kneser.kneser_ney_by_source):
    doc-weighted mean cross-entropy per source in exact integer
    micro-units — the per-feed drift monitor over the same certified
    per-doc scores."""
    from reader_spark.ops.kneser import kneser_ney_by_source

    docs = _read(spark, sf_dir, "documents")
    return kneser_ney_by_source(docs, discount_milli=KN_DISCOUNT_MILLI)


QUERIES = {
    "kneser_ney_bigram": _q_kneser_ney_bigram,
    "kneser_ney_by_source": _q_kneser_ney_by_source,
}
