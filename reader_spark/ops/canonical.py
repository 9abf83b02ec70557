"""rel=canonical chain resolution — the indexing-side canonicalization
step every search/crawl stack runs (the metadata battery already
extracts each page's ``<link rel="canonical">`` href, parity with the
reference's metadata-extractor.ts; this op resolves the GRAPH those
pointers form). Pages chain (A says B is canonical, B says C), so the
per-page pointer must be followed to its terminal: index/dedup under
the terminal URL, never an intermediate. Real crawls also contain
canonical CYCLES (A<->B, usually http/https or mobile/desktop pairs
misconfigured) — those must surface flagged, not spin or silently
self-elect.

Shape at 100 TB: pointer DOUBLING over the functional graph (Wyllie
list ranking, the ops/threads discipline): J rounds of one key-bounded
equi-join each cover chains up to 2^J hops — depth-64 chains cost 6
joins, not 64 — with per-round localCheckpoint keeping the plan flat.
Distances add along the doubling ((u -> w) = (u -> v) + (v -> w)), so
resolution depth rides free. Cycle detection is one final join against
the one-step table: after 2^J >= max real chain length, any
non-fixed-point terminal is on (or feeds) a cycle.

Returns (url, canonical_url, status, depth): status 'root' (no or
self pointer), 'resolved' (terminal reached, canonical_url = terminal,
depth = hops), or 'cycle' (canonical_url NULL, depth NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_canonical_chains(
    pages: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical",
    rounds: int = 6,
) -> DataFrame:
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    one = pages.select(
        F.col(url_col).alias("u"),
        F.coalesce(F.col(canonical_col), F.col(url_col)).alias("v"),
    ).select(
        "u",
        "v",
        F.when(F.col("v") == F.col("u"), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("d"),
    )
    # DANGLING pointers (canonical target never crawled) must not drop
    # their source rows in the doubling join: absent targets enter the
    # pointer table as implicit roots, so an un-crawled canonical still
    # resolves (status 'resolved' to the uncrawled URL — the indexing
    # semantics; the crawler's frontier picks it up separately).
    missing = (
        one.select(F.col("v").alias("u"))
        .distinct()
        .join(one.select("u"), "u", "left_anti")
        .select(
            "u", F.col("u").alias("v"), F.lit(0).cast("long").alias("d")
        )
    )
    one = one.union(missing).localCheckpoint(eager=True)

    p = one
    for _ in range(rounds):
        q = p.select(
            F.col("u").alias("qu"),
            F.col("v").alias("qv"),
            F.col("d").alias("qd"),
        )
        p = (
            p.join(q, p["v"] == q["qu"])
            .select("u", F.col("qv").alias("v"), (F.col("d") + F.col("qd")).alias("d"))
            .localCheckpoint(eager=True)
        )

    roots = one.where(F.col("d") == 0).select(F.col("u").alias("v"))
    resolved = p.join(roots, "v", "left_semi").select(
        "u", "v", "d", F.lit(True).alias("__term")
    )
    return (
        p.join(resolved.select("u", "__term"), "u", "left")
        # implicit-root rows for uncrawled targets are internal only
        .join(
            pages.select(F.col(url_col).alias("u")).distinct(),
            "u",
            "left_semi",
        )
        .select(
            F.col("u").alias("url"),
            F.when(F.col("__term"), F.col("v")).alias("canonical_url"),
            F.when(~F.coalesce(F.col("__term"), F.lit(False)), F.lit("cycle"))
            .when(F.col("d") == 0, F.lit("root"))
            .otherwise(F.lit("resolved"))
            .alias("status"),
            F.when(F.col("__term"), F.col("d")).alias("depth"),
        )
    )
