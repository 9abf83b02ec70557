"""Registry queries for input-hygiene audits (ops/audits.py).

The embedding corpus is corrupted deterministically (first-match-wins
mod chain: NULL vector, zero vector, NaN component, truncated dim) so
every failure class the audit reports actually occurs at fixture
scale; the language audit runs on the raw documents table, where the
word-soup text of zh-labeled docs genuinely detects as 'en' — a real
declared-vs-detected mismatch, not an injected one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reader_spark.ops.audits import embedding_quality_audit, lang_mismatch_audit


def synth_corrupted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    embeds = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fv = F.col("embedding").cast("array<double>")
    d = F.col("vec_id")
    corrupted = (
        F.when(d % 97 == 0, F.lit(None).cast("array<double>"))
        .when(d % 89 == 0, F.transform(fv, lambda x: x * 0.0))
        .when(
            d % 83 == 0,
            F.concat(
                F.array(F.lit(float("nan"))), F.slice(fv, 2, 63)
            ),
        )
        .when(d % 79 == 0, F.slice(fv, 1, 32))
        .otherwise(fv)
    )
    return embeds.select("vec_id", corrupted.alias("embedding"))


def _q_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column health audit: NULL/NaN/zero/dim-mismatch/norm stats in one scalar aggregate (ops.audits.embedding_audit)."""
    return embedding_quality_audit(
        synth_corrupted_embeddings(spark, sf_dir), expected_dim=64
    )


def _q_lang_mismatch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language agreement per source (ops.audits.lang_mismatch_audit)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lang_mismatch_audit(docs)


def _q_pack_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document attention-leak audit (ops/packing.
    pack_leakage_audit): flags on every 41st doc, packed at seq_len=512
    over the certified sequence_packing construction — sequences
    mixing flagged and clean content must be re-packed."""
    from reader_spark.ops.packing import pack_leakage_audit, pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    segs = pack_sequences(docs, "doc_id", "text", seq_len=512)
    flags = docs.select(
        "doc_id", (F.col("doc_id") % 41 == 0).alias("flagged")
    )
    return pack_leakage_audit(segs, flags)


QUERIES = {
    "embedding_audit": _q_embedding_audit,
    "lang_mismatch_audit": _q_lang_mismatch_audit,
    "pack_leakage": _q_pack_leakage,
}
