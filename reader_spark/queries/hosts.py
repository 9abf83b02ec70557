"""Host-layer queries: public-suffix-list registrable-domain (eTLD+1)
extraction and the PLD rollup — the host-grouping layer under every
per-domain statistic. Oracles live in reader_spark/oracles.py under
the same keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _hosts(docs: DataFrame) -> DataFrame:
    """Deterministic host fixture covering every PSL rule form:
    multi-label suffix (co.uk), plain gTLD, wildcard (*.ck), private
    section (github.io), the exception pair (www.ck / sub.www.ck), an
    unknown TLD (default rule), and a bare public suffix (no
    registrable domain)."""
    d = F.col("doc_id").cast("long")
    e = (d % 40).cast("string")
    host = (
        F.when(
            d % 6 == 0,
            F.when(d % 100 == 42, F.lit("co.uk")).otherwise(
                F.concat(F.lit("www.ex"), e, F.lit(".co.uk"))
            ),
        )
        .when(d % 6 == 1, F.concat(F.lit("blog.ex"), e, F.lit(".com")))
        .when(d % 6 == 2, F.concat(F.lit("a.b.ex"), e, F.lit(".ck")))
        .when(
            d % 6 == 3,
            F.concat(F.lit("user"), d.cast("string"), F.lit(".github.io")),
        )
        .when(
            d % 6 == 4,
            F.when(d % 4 == 0, F.lit("www.ck")).otherwise(
                F.lit("sub.www.ck")
            ),
        )
        .otherwise(F.concat(F.lit("ex"), e, F.lit(".unknowntld")))
    )
    return docs.select(d.alias("doc_id"), host.alias("host"))


def _q_registrable_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSL public-suffix + registrable-domain per host (ops.psl.
    registrable_domain, publicsuffix.org algorithm): bounded trailing-
    suffix explode, broadcast rule-dim joins for the exact/wildcard/
    exception forms, packed-long election (exception beats all, then
    longest match), default rule '*' for unmatched TLDs. A bare public
    suffix resolves to NULL registrable domain; the !www.ck exception
    host is its own."""
    from reader_spark.ops.psl import registrable_domain

    docs = _read(spark, sf_dir, "documents")
    return registrable_domain(_hosts(docs))


def _q_pld_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs-per-PLD rollup over the same assignment (one map-side-
    combined groupBy) — the host-aggregation every crawl-budget /
    politeness / quality-prior table should key on instead of raw
    hosts. NULL registrable domains (bare public suffixes) group
    together deliberately: they are the rows a raw-host rollup would
    silently mis-key."""
    from reader_spark.ops.psl import registrable_domain

    docs = _read(spark, sf_dir, "documents")
    out = registrable_domain(_hosts(docs))
    return out.groupBy("registrable_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
    )


QUERIES = {
    "registrable_domains": _q_registrable_domains,
    "pld_rollup": _q_pld_rollup,
}
