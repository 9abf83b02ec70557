"""Site-section rollup: URL path-prefix aggregation.

Crawl prioritization and seed-list curation work at the SECTION level
("/blog is gold, /tag is spam"): explode every document URL into its
path prefixes (/a/b/c → /a, /a/b, /a/b/c) and aggregate docs and
quality per (domain, prefix). The output ranks site sections for the
crawler's include/exclude regexes (vakra-dev/reader's includes/
excludes config, src/crawl-types.ts) with data instead of guesses.

Shape at 100 TB: the prefix explode multiplies rows by path DEPTH
(bounded, default cap 5), not corpus size; aggregation is ONE
map-side-combined groupBy on (domain, prefix) — a domain's mega
section collapses to one candidate row per map task. No window, no
join, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prefixes(path_col, max_depth: int):
    """['/a', '/a/b', ...] from '/a/b/...', capped at max_depth
    segments. Empty/root paths yield ['/']."""
    segs = F.filter(
        F.slice(F.split(path_col, "/"), 2, max_depth),
        lambda s: s != F.lit(""),
    )
    return F.when(F.size(segs) == 0, F.array(F.lit("/"))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(segs)),
            lambda i: F.concat(
                F.lit("/"), F.array_join(F.slice(segs, 1, i), "/")
            ),
        )
    )


def section_rollup(
    docs: DataFrame,
    domain_col: str = "domain",
    path_col: str = "path",
    quality_col: str = "quality",
    max_depth: int = 5,
) -> DataFrame:
    """(domain, section, depth, n_docs, mean_quality) per path prefix.

    ``mean_quality`` is round-6 so both engines agree; ``depth`` is the
    prefix's segment count (1 for '/a', 0 for the root '/')."""
    exploded = docs.select(
        F.col(domain_col).alias("domain"),
        F.explode(_prefixes(F.col(path_col), max_depth)).alias("section"),
        F.col(quality_col).alias("_q"),
    )
    depth = F.when(F.col("section") == "/", F.lit(0)).otherwise(
        F.size(F.split(F.col("section"), "/")) - 1
    )
    return (
        exploded.groupBy("domain", "section")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("_q"), 6).alias("mean_quality"),
        )
        .withColumn("depth", depth)
        .select("domain", "section", "depth", "n_docs", "mean_quality")
    )
