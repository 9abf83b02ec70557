"""Registry queries for bitext mining (ops/bitext.py).

Languages are synthesized deterministically from the embeddings table:
vec_id parity splits the corpus into an 'en' side and a 'fr' side (the
queries/preference.py fixture-synthesis discipline). The bucketed twin
uses 4 literal md5 planes so buckets genuinely collide at fixture
scale; its oracle replicates the identical plane literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reader_spark.ops.ann import md5_plane_weights
from reader_spark.ops.bitext import bitext_mine_brute, bitext_mine_bucketed

BITEXT_PLANES = 4


def synth_bilingual(spark: SparkSession, sf_dir: str) -> DataFrame:
    embeds = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embeds.select(
        "vec_id",
        "embedding",
        F.when(F.col("vec_id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )


def _q_bitext_mutual_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-NN bitext mining, brute exact-integer dots (ops.bitext.bitext_mine)."""
    return bitext_mine_brute(synth_bilingual(spark, sf_dir), "en", "fr")


def _q_bitext_mutual_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH-bucketed mutual-NN bitext mining, the scale path (ops.bitext.bitext_mine_bucketed)."""
    w = md5_plane_weights(dim=64, planes=BITEXT_PLANES)
    return bitext_mine_bucketed(
        synth_bilingual(spark, sf_dir), "en", "fr", weights=w
    )


def _q_bitext_csls_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSLS mutual mining (ops/bitext.bitext_mine_csls, Lample et al.
    2018 §2.3): hubness-penalized margins over the full candidate
    frame, knn=3."""
    from reader_spark.ops.bitext import bitext_mine_csls

    return bitext_mine_csls(synth_bilingual(spark, sf_dir), "en", "fr", knn=3)


QUERIES = {
    "bitext_mutual_pairs": _q_bitext_mutual_pairs,
    "bitext_mutual_bucketed": _q_bitext_mutual_bucketed,
    "bitext_csls_pairs": _q_bitext_csls_pairs,
}


def _q_url_parallel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-matching parallel-document candidates (ops/urlbitext.
    url_parallel_pairs — the ParaCrawl / WMT16 structural baseline):
    subdomain and path language markers stripped to a shared key, one
    groupBy election, cross-language pairs. A deterministic URL corpus
    derives within-row from doc_id (subdomain-marker, path-marker and
    no-marker forms all present; 'xx' exercises the non-marker path)."""
    from reader_spark.ops.urlbitext import url_parallel_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("fr"), F.lit("de"), F.lit("xx")),
        (d % 4 + 1).cast("int"),
    )
    base = F.concat(F.lit("site"), (d % 73).cast("string"), F.lit(".com"))
    page = F.concat(F.lit("/page/"), (d % 73).cast("string"))
    url = (
        F.when(
            d % 3 == 0,
            F.concat(F.lit("https://"), lang, F.lit("."), base, page),
        )
        .when(
            d % 3 == 1,
            F.concat(F.lit("https://"), base, F.lit("/"), lang, page),
        )
        .otherwise(F.concat(F.lit("https://www."), base, page))
    )
    return url_parallel_pairs(docs.select("doc_id", url.alias("url")))


QUERIES["url_parallel_pairs"] = _q_url_parallel_pairs
