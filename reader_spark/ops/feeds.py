"""RSS / Atom feed ingestion — the push side of crawl discovery.

Sitemaps (ops/sitemaps.py) enumerate what a site HAS; feeds announce
what is NEW. A polite crawler polls feeds at high frequency (they are
tiny) and sitemaps at low frequency, so feed ingestion is the
lowest-latency source of frontier URLs. This module parses RSS 2.0
``<item>`` and Atom (RFC 4287) ``<entry>`` blocks into one normalized
entry table, then anti-joins against the already-seen entry ids to
produce the incremental frontier.

Same construction discipline as ops/sitemaps.py: two RE2-safe regexes
riding the scan (entry blocks, then field extraction) — no XML library,
no Python UDF; a feed file is one row and stays inside one task. Format
differences are normalized in the projection:

* RSS: ``<title>``/``<link>``/``<guid>``/``<pubDate>``/``<description>``
  as element text; entry id falls back guid -> link.
* Atom: ``<title>``/``<id>``/``<updated>``/``<summary>`` as element
  text but the link is the ``href`` ATTRIBUTE of ``<link .../>``.
* ``<![CDATA[...]]>`` wrappers are stripped from text fields (feeds
  routinely CDATA their titles; sitemaps never do).

Shape at 100 TB: feed files are small rows fanning out to a bounded
number of entries (publishers cap feeds at 10-100 items) — the explode
is bounded per row and parsing is pure map output, no shuffle. The
frontier step is ONE left-anti equi-join keyed on entry_id against the
seen-set (itself just (entry_id) — digests travel, not content), the
same incremental-index discipline as ops/cdx.py's cdx_merge.

vakra-dev/reader context: its URL helpers EXCLUDE .rss/.atom from
content crawling (src/utils/url-helpers.ts:379) — feeds are frontier
metadata, not content; this module is the ingest path those files take
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ITEM_BLOCK = r"(?s)<item\b[^>]*>(.*?)</item>"
_ENTRY_BLOCK = r"(?s)<entry\b[^>]*>(.*?)</entry>"
_ATOM_HREF = r'(?s)<link\b[^>]*href="([^"]*)"'


def _text_field(body, tag: str):
    """Element text with CDATA unwrap; empty -> NULL."""
    raw = F.regexp_extract(body, rf"(?s)<{tag}[^>]*>(.*?)</{tag}>", 1)
    # Strip one optional CDATA wrapper around the whole value.
    unwrapped = F.regexp_replace(raw, r"(?s)^\s*<!\[CDATA\[(.*?)\]\]>\s*$", r"$1")
    return F.nullif(F.trim(unwrapped), F.lit(""))


def parse_feeds(
    feeds: DataFrame,
    xml_col: str = "xml",
    src_col: str = "feed_url",
) -> DataFrame:
    """Parse RSS/Atom feed XML blobs into one row per entry.

    Input: (feed_url, xml) — one row per fetched feed file.
    Output: (feed_url, fmt, entry_id, link, title, published, summary)
    where fmt is 'rss' or 'atom'. RSS entry_id = guid falling back to
    link; Atom entry_id = <id>. Files that are neither format emit no
    rows (the block regexes match nothing). Pure map — the entry
    explode is bounded by publisher feed-size conventions."""
    xml = F.col(xml_col)
    rss_blocks = F.regexp_extract_all(xml, F.lit(_ITEM_BLOCK), 1)
    atom_blocks = F.regexp_extract_all(xml, F.lit(_ENTRY_BLOCK), 1)
    entries = F.concat(
        F.transform(
            rss_blocks,
            lambda b: F.struct(F.lit("rss").alias("fmt"), b.alias("body")),
        ),
        F.transform(
            atom_blocks,
            lambda b: F.struct(F.lit("atom").alias("fmt"), b.alias("body")),
        ),
    )
    e = feeds.select(F.col(src_col), F.explode(entries).alias("e")).select(
        src_col,
        F.col("e.fmt").alias("fmt"),
        F.col("e.body").alias("_body"),
    )
    body = F.col("_body")
    is_rss = F.col("fmt") == "rss"
    rss_link = _text_field(body, "link")
    atom_link = F.nullif(
        F.trim(F.regexp_extract(body, _ATOM_HREF, 1)), F.lit("")
    )
    guid = _text_field(body, "guid")
    atom_id = _text_field(body, "id")
    return e.select(
        src_col,
        "fmt",
        F.when(is_rss, F.coalesce(guid, rss_link)).otherwise(atom_id).alias(
            "entry_id"
        ),
        F.when(is_rss, rss_link).otherwise(atom_link).alias("link"),
        _text_field(body, "title").alias("title"),
        F.when(is_rss, _text_field(body, "pubDate"))
        .otherwise(_text_field(body, "updated"))
        .alias("published"),
        F.when(is_rss, _text_field(body, "description"))
        .otherwise(_text_field(body, "summary"))
        .alias("summary"),
    )


def feed_frontier(entries: DataFrame, seen: DataFrame) -> DataFrame:
    """Incremental crawl frontier: entries whose entry_id has never been
    seen. ``seen`` carries just (entry_id) — the persisted feed-reader
    state, same skinny-index discipline as cdx_merge. NULL entry_id rows
    (malformed entries) are dropped: they cannot be deduplicated and a
    crawler must not loop on them. ONE left-anti equi-join."""
    return entries.where(F.col("entry_id").isNotNull()).join(
        seen.select("entry_id").distinct(), "entry_id", "left_anti"
    )
