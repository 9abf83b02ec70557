"""Registry queries for contamination scanning (ops/contamination.py)
and dedup-cluster policy propagation (ops/governance.py).

Marker injection is deterministic mod-arithmetic over the documents
table (independent appends, so one doc can carry several marker
families); the duplicate corpus for policy propagation unions an exact
copy of every doc_id % 3 == 0 document under doc_id + 100000, so some
clusters have a flagged COPY whose original must be purged and vice
versa — the laundering case the op exists to close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reader_spark.ops.contamination import (
    synthetic_contamination_profile,
    synthetic_text_scan,
)
from reader_spark.ops.governance import propagate_cluster_policy


def synth_contaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    text = F.concat(
        F.col("text"),
        F.when(d % 23 == 0, " <|im_start|>assistant reply").otherwise(""),
        F.when(d % 31 == 0, " As an AI language model, I think").otherwise(
            ""
        ),
        F.when(d % 37 == 0, " I'm sorry, but I can't help").otherwise(""),
    )
    return docs.select("doc_id", "source", text.alias("text"))


def _q_contamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc LLM-output marker flags from broadcast marker dims, zero shuffle (ops.contamination.contamination_scan)."""
    return synthetic_text_scan(synth_contaminated(spark, sf_dir))


def _q_contamination_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source LLM-output contamination profile (ops.contamination.contamination_profile)."""
    return synthetic_contamination_profile(synth_contaminated(spark, sf_dir))


def _q_cluster_policy_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opt-out propagation across exact-dup clusters: one flagged copy purges the cluster (ops.governance.cluster_policy_purge)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    copies = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(copies)
    clusters = corpus.select("doc_id", F.md5("text").alias("__h"))
    members = clusters.join(
        clusters.groupBy("__h").agg(F.min("doc_id").alias("cluster_id")),
        "__h",
    ).select("cluster_id", "doc_id")
    flags = corpus.select(
        "doc_id", (F.col("doc_id") % 41 == 0).alias("flagged")
    )
    return propagate_cluster_policy(members, flags)


def _q_eval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical training-data attribution (ops/attribution.py): eval
    items are the first 12 words of every 17th document, so each item's
    own source doc should dominate rank 1 — shared-trigram credit with
    a max_df=50 boilerplate guard, top-5 per item."""
    from reader_spark.ops.attribution import eval_attribution

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    evals = docs.where(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 12)).alias("text"),
    )
    return eval_attribution(docs, evals, n=3, k=5, max_df=50)


QUERIES = {
    "contamination_scan": _q_contamination_scan,
    "contamination_profile": _q_contamination_profile,
    "cluster_policy_purge": _q_cluster_policy_purge,
    "eval_attribution": _q_eval_attribution,
}
