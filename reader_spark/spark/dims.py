"""Dimension-table joins (J3/J4, SURVEY.md §2.7): tiny config tables
(robots rules per origin, domain profiles) broadcast-joined to the URL/doc
stream — the dataset form of the reference's in-heap Maps
(scraper.ts:44,56-63; domain-profiles.ts:39-67)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .columns import host_key_col


def _suffixes(host: F.Column) -> F.Column:
    """['shop.amazon.com', 'amazon.com', 'com'] for 'shop.amazon.com'."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n), "."),
    )


def join_domain_profiles(
    urls: DataFrame, profiles: DataFrame, url_col: str = "url"
) -> DataFrame:
    """getDomainProfile as a dataflow (domain-profiles.ts:39-67): exact
    hostname match wins, else the LONGEST matching `.domain` suffix.
    Profiles is a tiny dimension — both joins broadcast."""
    keyed = urls.withColumn("_host", host_key_col(F.col(url_col)))

    exact = profiles.select(
        F.col("domain").alias("_host"),
        F.struct(*[c for c in profiles.columns if c != "domain"]).alias("_exact"),
    )
    out = keyed.join(F.broadcast(exact), "_host", "left")

    suffixed = (
        keyed.select("_host")
        .distinct()
        .select("_host", F.explode(_suffixes(F.col("_host"))).alias("_suffix"))
        .where(F.col("_suffix") != F.col("_host"))  # exact handled above
    )
    suffix_hits = (
        suffixed.join(
            F.broadcast(
                profiles.select(
                    F.col("domain").alias("_suffix"),
                    F.struct(*[c for c in profiles.columns if c != "domain"]).alias(
                        "_bysuffix"
                    ),
                )
            ),
            "_suffix",
        )
        .withColumn("_sufflen", F.length("_suffix"))
        .groupBy("_host")
        .agg(F.max_by("_bysuffix", "_sufflen").alias("_suffixmatch"))
    )
    out = out.join(F.broadcast(suffix_hits), "_host", "left")
    return out.withColumn(
        "profile", F.coalesce(F.col("_exact"), F.col("_suffixmatch"))
    ).drop("_host", "_exact", "_suffixmatch")
