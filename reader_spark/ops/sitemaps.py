"""Sitemap ingestion and recrawl scheduling.

The crawl-frontier side of the refresh lifecycle: parse XML sitemaps
(sitemaps.org protocol — ``<urlset>`` leaf files and ``<sitemapindex>``
index files) into a typed URL table, then combine the publisher's
``changefreq``/``lastmod`` hints with OBSERVED per-URL change rates
(ops/delta.py change_rate, Cho & Garcia-Molina 2003) into a recrawl-due
schedule. Sits upstream of ops/delta.py's snapshot diff and
jobs/refresh_job.py: sitemaps say what a site CLAIMS changes; the delta
history says what actually does; the schedule trusts observation first,
hints second.

Parsing is two RE2-safe regexes riding the scan (entry blocks, then
field extraction) — no XML library, no Python UDF; a 50 MB sitemap file
is one row and stays inside one task. ``priority`` is held in
milli-units (spec default 0.5 → 500) so no float ever crosses an
engine boundary; ``changefreq`` maps to hours through the protocol's
closed vocabulary.

Shape at 100 TB: sitemap files are small rows fanning out to ≤50k URL
entries each (the spec's hard cap) — the explode is bounded per row and
the result is pure map output, no shuffle. The schedule join keys on
the URL (observed-rate dim left-joined onto hint entries); `is_due`
is scan-local arithmetic over datediff.

vakra-dev/reader context: its URL helpers EXCLUDE .sitemap/.rss/.atom
from content crawling (src/utils/url-helpers.ts:379) — sitemaps are
frontier metadata, not content; this module is the ingest path those
files take instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sitemaps.org closed changefreq vocabulary -> revisit hours.
# 'always' -> 0 (refetch every pass); 'never' -> NULL (hint says skip;
# observation can still override).
FREQ_HOURS = {
    "always": 0,
    "hourly": 1,
    "daily": 24,
    "weekly": 168,
    "monthly": 730,
    "yearly": 8766,
}

_URL_BLOCK = r"(?s)<url\b[^>]*>(.*?)</url>"
_SM_BLOCK = r"(?s)<sitemap\b[^>]*>(.*?)</sitemap>"


def _field(body, tag: str):
    return F.nullif(
        F.trim(F.regexp_extract(body, rf"(?s)<{tag}>(.*?)</{tag}>", 1)),
        F.lit(""),
    )


def parse_sitemaps(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    src_col: str = "sitemap_url",
) -> DataFrame:
    """Parse sitemap XML blobs into one row per entry.

    Input: (sitemap_url, xml) — one row per fetched sitemap file.
    Output: (sitemap_url, kind, loc, lastmod, changefreq, freq_hours,
    priority_milli) where kind is 'url' (leaf entry) or 'sitemap'
    (index entry pointing at a child sitemap — the frontier rows a
    crawler fetches next). ``<url\\b`` / ``<sitemap\\b`` word
    boundaries keep ``<urlset>``/``<sitemapindex>`` wrappers from
    matching as entries. Pure map; the entry explode is bounded by the
    spec's 50k-entries-per-file cap."""
    url_blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 1)
    sm_blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_SM_BLOCK), 1)
    entries = F.concat(
        F.transform(
            url_blocks, lambda b: F.struct(F.lit("url").alias("kind"), b.alias("body"))
        ),
        F.transform(
            sm_blocks,
            lambda b: F.struct(F.lit("sitemap").alias("kind"), b.alias("body")),
        ),
    )
    e = sitemaps.select(
        F.col(src_col), F.explode(entries).alias("e")
    ).select(
        src_col,
        F.col("e.kind").alias("kind"),
        F.col("e.body").alias("_body"),
    )
    body = F.col("_body")
    cf = _field(body, "changefreq")
    pr = _field(body, "priority")
    freq = None
    for name, hours in FREQ_HOURS.items():
        clause = F.when(cf == name, F.lit(hours))
        freq = clause if freq is None else freq.when(cf == name, F.lit(hours))
    return e.select(
        src_col,
        "kind",
        _field(body, "loc").alias("loc"),
        _field(body, "lastmod").alias("lastmod"),
        cf.alias("changefreq"),
        freq.cast("long").alias("freq_hours"),
        F.coalesce(
            F.round(pr.cast("double") * 1000).cast("long"), F.lit(500)
        ).alias("priority_milli"),
    )


def recrawl_schedule(
    entries: DataFrame,
    as_of: str,
    rates: DataFrame | None = None,
    loc_col: str = "loc",
    rate_col: str = "rate_cho",
    default_hours: int = 168,
) -> DataFrame:
    """Recrawl-due schedule from sitemap hints + observed change rates.

    ``entries``: parse_sitemaps output (kind='url' rows). ``rates``:
    optional (loc, rate_cho) dim from ops.delta.change_rate — the
    Poisson rate per visit-day; the scheduler revisits at interval
    ∝ 1/λ (Cho & Garcia-Molina 2003 §6), so hours_obs =
    floor(24/λ). Precedence: observation > publisher hint > the
    default. A URL with no lastmod has never been confirmed fetched —
    always due. 'always' (0 h) is due on every pass; 'never' yields a
    NULL hint that defers to observation or the default.

    ``as_of`` is an explicit date string — schedulers must be
    replayable, so "now" is an argument, not a clock read."""
    days = F.datediff(F.to_date(F.lit(as_of)), F.to_date(F.col("lastmod")))
    e = entries.withColumn("days_since", days.cast("long"))
    if rates is not None:
        r = rates.select(
            F.col(loc_col).alias("_rloc"),
            F.when(
                F.col(rate_col) > 0,
                F.floor(24.0 / F.col(rate_col)),
            )
            .cast("long")
            .alias("hours_obs"),
        )
        # rates has one row per URL — same cardinality as entries, so
        # this is a plain equi-join on the URL key (AQE picks the
        # strategy); broadcasting would be wrong at corpus scale.
        e = e.join(r, e[loc_col] == r["_rloc"], "left").drop("_rloc")
    else:
        e = e.withColumn("hours_obs", F.lit(None).cast("long"))
    interval = F.coalesce(
        F.col("hours_obs"), F.col("freq_hours"), F.lit(default_hours)
    )
    due = F.when(F.col("lastmod").isNull(), F.lit(1)).otherwise(
        (F.col("days_since") * 24 >= interval).cast("int")
    )
    return e.select(
        loc_col,
        "lastmod",
        "days_since",
        "freq_hours",
        "hours_obs",
        interval.cast("long").alias("interval_hours"),
        "priority_milli",
        due.cast("int").alias("is_due"),
    )


def politeness_slots(
    frontier: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    loc_col: str = "loc",
    priority_col: str = "priority_milli",
    delay_col: str = "crawl_delay_ms",
    default_delay_ms: int = 1000,
) -> DataFrame:
    """Per-host fetch-slot assignment: the politeness schedule a fetcher
    fleet executes after recrawl_schedule decides WHAT to fetch.

    Each host is a serial queue (one in-flight request per host — the
    robots.txt crawl-delay contract): URLs rank within their host by
    (priority desc, loc asc — deterministic), and slot k fetches at
    offset (k-1)·crawl_delay. ``host_makespan_ms`` (n_urls·delay) is the
    per-host critical path — the fleet's wall clock is its max, which
    is why frontier builders cap per-host batch size rather than total
    size.

    The window partitions on host (bounded by the per-host frontier
    cap); the delay dim joins on the same key. All integer
    milliseconds."""
    from pyspark.sql import Window

    d = delays.select(
        F.col(host_col).alias("_dhost"),
        F.col(delay_col).cast("long").alias(delay_col),
    )
    e = frontier.join(
        d, frontier[host_col] == d["_dhost"], "left"
    ).drop("_dhost")
    e = e.withColumn(
        delay_col, F.coalesce(F.col(delay_col), F.lit(default_delay_ms))
    )
    w = Window.partitionBy(host_col).orderBy(
        F.desc(priority_col), F.asc(loc_col)
    )
    h = Window.partitionBy(host_col)
    return e.select(
        loc_col,
        host_col,
        F.row_number().over(w).cast("long").alias("slot"),
        delay_col,
        ((F.row_number().over(w) - 1) * F.col(delay_col))
        .cast("long")
        .alias("fetch_offset_ms"),
        (F.count(F.lit(1)).over(h) * F.col(delay_col))
        .cast("long")
        .alias("host_makespan_ms"),
    )
