"""BFS crawl as an iterative DataFrame dataflow (reference:
src/crawler.ts:49-148; SURVEY.md §3.2).

The reference crawls the live web; the batch engine crawls a *page corpus*:
a DataFrame ``pages(url, payload)`` stands in for the fetch layer (the same
substitution as S1 -> table scan). Each BFS round is:

    frontier -> join pages on url_key (the "fetch")
             -> fused UDF: title/description + anchor extraction
             -> explode(links) -> NATIVE admission predicates
                (same-domain, content-URL, include/exclude regex — all
                 codegen'd rlike/equality on columns)
             -> left-anti join vs visited (J1) -> dropDuplicates (J2)

Depth is the driver-loop bound (W4); maxPages is applied as
orderBy(depth, url).limit(n) — BFS order made deterministic under
parallelism by using url as the intra-depth tiebreaker (W3).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import get_url_key
from .columns import host_key_col, is_content_url_col, url_key_col

_PAGE_UDF_SCHEMA = (
    "url string, title string, description string, links array<string>"
)


def _page_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..extract.metadata import _HeadIndex
    from ..functions.links import extract_links
    from ..htmlkit.dom import parse_html

    for batch in batches:
        urls, titles, descriptions, links = [], [], [], []
        for url, payload in zip(batch["url"], batch["payload"]):
            document = parse_html(payload or "")
            idx = _HeadIndex(document)
            urls.append(url)
            titles.append((idx.title_text or "").strip() or None)
            descriptions.append(idx.meta("description"))
            links.append(extract_links(payload or "", url))
        yield pd.DataFrame(
            {"url": urls, "title": titles, "description": descriptions, "links": links}
        )


def _robots_predicate(robots_txt: str, user_agent: str = "*"):
    """Compile robots rules (U8) into ONE native column predicate:
    allow-alternation wins, else not disallow-alternation (allow-first
    semantics of isPathAllowed, robots-parser.ts:63-83)."""
    import re as _re

    from ..functions.robots import parse_robots_txt

    rules = parse_robots_txt(robots_txt, user_agent)

    def to_regex(pattern: str) -> str:
        escaped = _re.sub(r"[.+?^${}()|\[\]\\]", lambda m: "\\" + m.group(0), pattern)
        escaped = escaped.replace("*", ".*")
        if escaped.endswith("\\$"):
            return escaped[:-2] + "$"
        return "^" + escaped

    path = F.regexp_replace(
        F.regexp_extract(F.col("url"), r"^https?://[^/]*(/.*)?$", 1), r"#.*$", ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    allowed = (
        path.rlike("|".join(to_regex(p) for p in rules.allowed_paths))
        if rules.allowed_paths
        else F.lit(False)
    )
    disallowed = (
        path.rlike("|".join(to_regex(p) for p in rules.disallowed_paths))
        if rules.disallowed_paths
        else F.lit(False)
    )
    return allowed | ~disallowed


def crawl(
    spark: SparkSession,
    pages: DataFrame,
    seed_url: str,
    max_depth: int = 1,
    max_pages: int = 20,
    include_patterns: Optional[list[str]] = None,
    exclude_patterns: Optional[list[str]] = None,
    robots_txt: Optional[str] = None,
) -> DataFrame:
    """BFS over the page corpus from seed_url. Returns
    (url, depth, title, description) in deterministic BFS order,
    limited to max_pages. Defaults mirror Crawler's (crawler.ts:34-42).
    robots_txt (if given) is compiled to a native allow/deny predicate."""
    keyed_pages = pages.select(
        url_key_col(F.col("url")).alias("url_key"), "url", "payload"
    )

    frontier = spark.createDataFrame(
        [(get_url_key(seed_url), seed_url, 0)], "url_key string, url string, depth int"
    )
    visited = frontier.select("url_key")
    collected: Optional[DataFrame] = None

    for depth in range(max_depth + 1):
        # "Fetch": resolve frontier URLs against the corpus.
        fetched = frontier.join(
            keyed_pages.withColumnRenamed("url", "page_url"), "url_key"
        )
        processed = fetched.select("url", "payload").mapInPandas(
            _page_batch, schema=_PAGE_UDF_SCHEMA
        )
        round_result = (
            processed.join(frontier.select("url", "depth"), "url")
            .select("url", "depth", "title", "description", "links")
        )
        round_pages = round_result.drop("links").localCheckpoint(eager=True)
        links_src = round_result.select("depth", F.explode("links").alias("link"))
        collected = (
            round_pages if collected is None else collected.unionByName(round_pages)
        )
        if depth == max_depth or collected.count() >= max_pages:
            break

        # Admission predicates — all native (U4, U6, U5).
        admitted = links_src.select(
            F.col("link").alias("url"), (F.col("depth") + 1).alias("depth")
        ).where(host_key_col(F.col("url")) == F.lit(_host_key(seed_url)))
        admitted = admitted.where(is_content_url_col(F.col("url")))
        if include_patterns:
            admitted = admitted.where(
                F.col("url").rlike("(?i)" + "|".join(include_patterns))
            )
        if exclude_patterns:
            admitted = admitted.where(
                ~F.col("url").rlike("(?i)" + "|".join(exclude_patterns))
            )
        if robots_txt:
            admitted = admitted.where(_robots_predicate(robots_txt))

        # Dedup (J1/J2): anti-join visited, one row per url_key.
        candidates = (
            admitted.withColumn("url_key", url_key_col(F.col("url")))
            .join(visited, "url_key", "left_anti")
            .groupBy("url_key")
            .agg(F.min("url").alias("url"), F.min("depth").alias("depth"))
        ).localCheckpoint(eager=True)

        if candidates.isEmpty():
            break
        frontier = candidates.select("url_key", "url", "depth")
        visited = visited.unionByName(frontier.select("url_key")).distinct()

    assert collected is not None
    return collected.orderBy("depth", "url").limit(max_pages)


def _host_key(url: str) -> str:
    from urllib.parse import urlsplit

    return (urlsplit(url).hostname or "").removeprefix("www.").lower()
