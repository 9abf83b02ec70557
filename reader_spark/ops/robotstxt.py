"""Corpus-scale robots.txt parsing: fetched robots files -> typed
directive rows -> the per-host crawler dim.

functions/robots.py parses ONE robots.txt in Python for the broadcast
allow-predicate (J3); this module is the corpus-analysis path — parse
EVERY host's robots.txt as columns (no Python), so crawl-delay
distributions, disallow-breadth stats and sitemap discovery run at
10^12-host scale and feed ops/sitemaps.politeness_slots its delay dim.

Grammar (REP, RFC 9309): ``key: value`` lines, ``#`` comments,
User-agent lines open a GROUP (consecutive User-agent lines share one
group — the RFC's multi-agent group form); Allow/Disallow/Crawl-delay
bind to every agent of the enclosing group; directives BEFORE any
group are ignored; Sitemap is group-independent (emitted with NULL
agent).

Shape: line explode rides the scan (robots files are small); group
assignment is lag + running sum over a window PARTITIONED BY host
(bounded by lines-per-file); the agent×directive attach is a self-join
on (host, group_id) — groups have a handful of agents, so the join is
key-local fan-out, not a blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GROUP_KEYS = ("allow", "disallow", "crawl-delay")


def robots_parse(
    files: DataFrame,
    host_col: str = "host",
    content_col: str = "content",
) -> DataFrame:
    """(host, content) -> (host, agent, directive, value, line_no).

    Group-scoped directives appear once per agent of their group;
    Sitemap rows carry agent NULL; out-of-group directives and
    unknown keys are dropped."""
    lines = files.select(
        host_col,
        F.posexplode(F.split(F.col(content_col), "\n")).alias(
            "line_no", "raw"
        ),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    key = F.lower(F.regexp_extract(clean, r"^([A-Za-z\-]+)\s*:", 1))
    value = F.trim(F.regexp_extract(clean, r"^[A-Za-z\-]+\s*:(.*)$", 1))
    parsed = lines.select(
        host_col,
        F.col("line_no").cast("long").alias("line_no"),
        key.alias("key"),
        value.alias("value"),
    ).where(F.col("key") != "")

    w = Window.partitionBy(host_col).orderBy("line_no")
    is_agent = (F.col("key") == "user-agent").cast("int")
    opens = (
        (is_agent == 1) & (F.lag(is_agent, 1, 0).over(w) == 0)
    ).cast("int")
    grouped = parsed.withColumn("group_id", F.sum(opens).over(w))

    agents = grouped.where(F.col("key") == "user-agent").select(
        host_col,
        "group_id",
        F.lower(F.col("value")).alias("agent"),
    )
    directives = grouped.where(F.col("key").isin(*GROUP_KEYS)).select(
        host_col, "group_id", "key", "value", "line_no"
    )
    scoped = directives.join(agents, [host_col, "group_id"]).select(
        host_col,
        "agent",
        F.col("key").alias("directive"),
        "value",
        "line_no",
    )
    sitemaps = grouped.where(F.col("key") == "sitemap").select(
        host_col,
        F.lit(None).cast("string").alias("agent"),
        F.lit("sitemap").alias("directive"),
        "value",
        "line_no",
    )
    return scoped.unionByName(sitemaps)


def robots_host_dim(
    rules: DataFrame,
    host_col: str = "host",
    agent: str = "*",
    default_delay_ms: int = 1000,
) -> DataFrame:
    """robots_parse rows -> the per-host crawler dim: crawl_delay_ms
    for the given agent (seconds -> ms, default when absent/garbled),
    disallow/allow breadth, full-block flag (Disallow: /), sitemap
    count. ONE map-side-combined groupBy on host."""
    mine = rules.where(
        (F.col("agent") == agent) | F.col("agent").isNull()
    )
    delay_s = F.when(
        (F.col("directive") == "crawl-delay"),
        F.col("value").cast("double"),
    )
    return mine.groupBy(host_col).agg(
        F.coalesce(
            (F.min(delay_s) * 1000).cast("long"),
            F.lit(default_delay_ms),
        ).alias("crawl_delay_ms"),
        F.sum(
            (F.col("directive") == "disallow").cast("long")
        ).alias("n_disallow"),
        F.sum((F.col("directive") == "allow").cast("long")).alias("n_allow"),
        F.max(
            (
                (F.col("directive") == "disallow") & (F.col("value") == "/")
            ).cast("int")
        ).alias("full_block"),
        F.sum(
            (F.col("directive") == "sitemap").cast("long")
        ).alias("n_sitemaps"),
    )


def robots_meta_gate(
    df: DataFrame,
    robots_col: str = "robots",
) -> DataFrame:
    """Page-level robots DIRECTIVE semantics over the extracted
    ``<meta name="robots">`` string (the metadata battery emits the raw
    value — parity with the reference's metadata-extractor.ts:50; this
    is the corpus-scale gate on top). Google/Bing REP meta semantics:
    comma-separated case-insensitive tokens; ``none`` = noindex +
    nofollow; ``all`` is a no-op; unknown tokens ignored; a NULL/absent
    tag permits everything. noindex drops the page from the index-side
    corpus, nofollow kills its link expansion in the crawl frontier,
    noarchive blocks cached/WARC re-serving.

    Appends (noindex, nofollow, noarchive, indexable) as native boolean
    columns — one pure row expression riding the scan, no shuffle.
    """
    toks = F.split(
        F.regexp_replace(F.lower(F.coalesce(F.col(robots_col), F.lit(""))),
                         r"\s+", ""),
        ",",
    )
    has = lambda t: F.array_contains(toks, t)  # noqa: E731
    noindex = has("noindex") | has("none")
    nofollow = has("nofollow") | has("none")
    noarchive = has("noarchive")
    return df.select(
        "*",
        noindex.alias("noindex"),
        nofollow.alias("nofollow"),
        noarchive.alias("noarchive"),
        (~noindex).alias("indexable"),
    )
