"""Per-host crawl-trap detection.

Crawler traps — calendar pages, session-id query strings, faceted
search, infinitely deep path generators — burn crawl budget on URL
spaces that keep growing while content stops being novel (the classic
discussion is Heydon & Najork's Mercator paper, WWW 1999; the signals
here are the standard public heuristics). The tell is per-host: URL
count rises, distinct content does not, query strings and date-like
path segments proliferate, paths run deep.

This module scores hosts from a crawl ledger of (host, url, digest)
rows with four integer milli-unit signals and one weighted score:

* ``dup_milli``   — 1 - distinct digests / urls (content novelty gap)
* ``query_milli`` — share of URLs carrying a query string
* ``date_milli``  — share of URLs with a date-like path segment
* ``depth_max``   — deepest path (slash count net of the scheme)
* ``trap_milli``  — 500·dup + 200·query + 150·date (in milli) + 150 if
  depth_max >= 8; ``trap_suspect`` at >= 400.

The weights are a documented heuristic prior, not learned — the point
is a deterministic, engine-portable ranking the frontier scheduler can
threshold.

Shape at 100 TB: ONE two-level aggregate keyed by host (the distinct-
digest count is a (host, digest) pre-aggregate with map-side combine —
digests shuffle, never payloads); every signal is a native column.
Hosts are ~10^7 at web scale: the output is a bounded dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DATE_SEGMENT_RE = "/[0-9]{4}[-/][0-9]{2}"


def trap_signals(
    crawl: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-host trap signals + score over (host, url, digest) rows.
    Output: (host, n_urls, n_digests, dup_milli, query_milli,
    date_milli, depth_max, trap_milli, trap_suspect)."""
    u = F.col(url_col)
    rows = crawl.select(
        F.col(host_col).alias("host"),
        F.col(digest_col).alias("digest"),
        u.contains("?").cast("long").alias("has_query"),
        u.rlike(DATE_SEGMENT_RE).cast("long").alias("has_date"),
        (
            F.length(u) - F.length(F.regexp_replace(u, "/", "")) - 2
        ).cast("long").alias("depth"),
    )
    # distinct digests per host: (host, digest) pre-aggregate so the
    # wide count stays map-side-combined
    per_digest = rows.groupBy("host", "digest").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("has_query").alias("q"),
        F.sum("has_date").alias("d"),
        F.max("depth").alias("dep"),
    )
    agg = per_digest.groupBy("host").agg(
        F.sum("n").alias("n_urls"),
        F.count(F.lit(1)).alias("n_digests"),
        F.sum("q").alias("n_query"),
        F.sum("d").alias("n_date"),
        F.max("dep").alias("depth_max"),
    )
    dup = F.expr("(n_urls - n_digests) * 1000 div n_urls")
    qm = F.expr("n_query * 1000 div n_urls")
    dm = F.expr("n_date * 1000 div n_urls")
    out = agg.select(
        "host",
        "n_urls",
        "n_digests",
        dup.cast("long").alias("dup_milli"),
        qm.cast("long").alias("query_milli"),
        dm.cast("long").alias("date_milli"),
        "depth_max",
    )
    score = F.expr(
        "(500 * dup_milli + 200 * query_milli + 150 * date_milli) div 1000"
        " + CASE WHEN depth_max >= 8 THEN 150 ELSE 0 END"
    )
    return out.withColumn("trap_milli", score.cast("long")).withColumn(
        "trap_suspect", F.col("trap_milli") >= 400
    )
