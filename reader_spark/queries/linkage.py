"""Record-linkage queries (Fellegi-Sunter 1969 with Newcombe blocking):
probabilistic cross-feed entity resolution over a deterministically
perturbed twin of the documents table. Oracles live in
reader_spark/oracles.py under the same keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEN_BUCKET = 512


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _records(docs: DataFrame) -> DataFrame:
    """Linkage fields from a document row: name = first alphabetic
    token (or 'none'), host = source, len_bucket = n_chars div 512;
    block = first name char + len bucket (name-prefix + size blocking,
    the classic two-signal pass)."""
    name = F.coalesce(
        F.element_at(
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"), lambda x: x != ""
            ),
            1,
        ),
        F.lit("none"),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("did"),
        name.alias("name"),
        F.col("source").alias("host"),
        (F.col("n_chars").cast("long") / F.lit(LEN_BUCKET))
        .cast("long")
        .alias("len_bucket"),
    )


def _ab(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A = the records verbatim; B = the drifted second feed: doc_id
    mod 4 == 0 identical (clean re-crawl), == 1 name typo, == 2 mirror
    host, == 3 both drifted AND renamed out of its block — the pinned
    blocking-recall miss."""
    r = _records(docs)
    a = r.select(
        F.concat(F.lit("a"), F.col("did").cast("string")).alias("rid"),
        "name",
        "host",
        "len_bucket",
    )
    m = F.col("did") % 4
    b = r.select(
        F.concat(F.lit("b"), F.col("did").cast("string")).alias("rid"),
        F.when(m == 1, F.concat(F.col("name"), F.lit("x")))
        .when(m == 3, F.concat(F.lit("zz"), F.col("name")))
        .otherwise(F.col("name"))
        .alias("name"),
        F.when(
            (m == 2) | (m == 3), F.concat(F.lit("m-"), F.col("host"))
        )
        .otherwise(F.col("host"))
        .alias("host"),
        "len_bucket",
    )
    blk = F.concat(
        F.substring("name", 1, 1),
        F.lit("-"),
        F.col("len_bucket").cast("string"),
    )
    return a.withColumn("block", blk), b.withColumn("block", blk)


def _q_fs_linkage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Fellegi-Sunter pair scoring (ops.linkage.fs_link_pairs):
    one equi-join on the blocking key, binary field agreement over
    (name, host, len_bucket), integer milli-bit log-likelihood weights
    fixed at import, link/possible/non_link at +6.0/0.0 bits. The
    clean re-crawl scores 'link', single-field drift lands in clerical
    review, and the renamed+mirrored quarter never meets its twin —
    the blocking-recall miss, pinned."""
    from reader_spark.ops.linkage import fs_link_pairs

    docs = _read(spark, sf_dir, "documents")
    a, b = _ab(docs)
    return fs_link_pairs(a, b)


def _q_fs_linkage_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement-pattern rollup (ops.linkage.fs_linkage_profile): pair
    counts and the (constant-within-pattern) score per (gamma,
    decision) — the clerical-review workload estimate."""
    from reader_spark.ops.linkage import fs_link_pairs, fs_linkage_profile

    docs = _read(spark, sf_dir, "documents")
    a, b = _ab(docs)
    return fs_linkage_profile(fs_link_pairs(a, b))


def _q_fs_linkage_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-quality audit against the planted truth (rid digits
    equal <=> same underlying doc): pair counts by (decision,
    is_true_match) — the precision/recall surface of the m/u model on
    this corpus."""
    from reader_spark.ops.linkage import fs_link_pairs

    docs = _read(spark, sf_dir, "documents")
    a, b = _ab(docs)
    pairs = fs_link_pairs(a, b)
    truth = F.substring("rid_a", 2, 1000) == F.substring("rid_b", 2, 1000)
    return (
        pairs.select("decision", truth.alias("is_true_match"))
        .groupBy("decision", "is_true_match")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


QUERIES = {
    "fs_linkage_pairs": _q_fs_linkage_pairs,
    "fs_linkage_profile": _q_fs_linkage_profile,
    "fs_linkage_eval": _q_fs_linkage_eval,
}
