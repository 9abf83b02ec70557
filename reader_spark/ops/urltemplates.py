"""URL template mining — DUST-style duplicate-URL-space discovery
(Bar-Yossef, Keidar & Schonfeld, WWW 2007, "Do Not Crawl in the DUST:
Different URLs with Similar Text").

A crawler that has seen ``/p/123`` and ``/p/124`` with near-identical
content wants the RULE, not the instances: generalize URLs into
templates by folding variable runs (UUIDs, long hex ids, digit runs)
into typed placeholders, then measure per-template content novelty.
Templates with many URLs and few distinct digests are DUST — rewrite /
skip rules for the frontier; templates with high novelty are real
content series worth crawling deeper.

Template transform (ordered, all RE2-safe):
1. UUIDs              → ``{U}``
2. hex runs >= 16     → ``{H}``   (16+ so English hex-alphabet words
                                   like 'cafe' never fold)
3. digit runs         → ``{N}``

Shape at 100 TB: the transform is a per-row regexp_replace chain riding
the scan; the rollup is a (host, template, digest) pre-aggregate then a
(host, template) aggregate — digests shuffle, never payloads; output is
bounded by the template space (tiny relative to URLs — that is the
point of templating).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UUID_RE = (
    "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
)
HEX_RE = "[0-9a-f]{16,}"
NUM_RE = "[0-9]+"


def url_template_col(url: Column) -> Column:
    t = F.lower(url)
    t = F.regexp_replace(t, UUID_RE, "{U}")
    t = F.regexp_replace(t, HEX_RE, "{H}")
    return F.regexp_replace(t, NUM_RE, "{N}")


def url_templates(
    crawl: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-(host, template) novelty rollup: (host, template, n_urls,
    n_digests, dup_milli, sample_url). ``dup_milli`` near 1000 marks a
    DUST rule; ``sample_url`` (the lexicographic min) anchors the rule
    to a concrete instance."""
    rows = crawl.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.col(digest_col).alias("digest"),
        url_template_col(F.col(url_col)).alias("template"),
    )
    per_digest = rows.groupBy("host", "template", "digest").agg(
        F.count(F.lit(1)).alias("n"), F.min("url").alias("u")
    )
    return (
        per_digest.groupBy("host", "template")
        .agg(
            F.sum("n").alias("n_urls"),
            F.count(F.lit(1)).alias("n_digests"),
            F.min("u").alias("sample_url"),
        )
        .select(
            "host",
            "template",
            "n_urls",
            "n_digests",
            F.expr("(n_urls - n_digests) * 1000 div n_urls")
            .cast("long")
            .alias("dup_milli"),
            "sample_url",
        )
    )
