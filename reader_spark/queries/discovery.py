"""Feed-discovery queries (session-8 family): RSS/Atom ingestion and the
incremental feed frontier. Oracles live in reader_spark/oracles.py under
the same keys (the oracle re-synthesizes the same XML in SQL and re-parses
it with the same regexes — one spec, two engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _synth_feed_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic feed corpus from documents: even doc_ids become RSS
    <item>s in one feed per source; odd doc_ids become Atom <entry>s in
    one feed per language. Field-absence lattice: RSS guid absent %5==0
    (entry_id falls back to link), pubDate absent %9==0, description
    absent %11==0, title CDATA-wrapped %7==0; Atom summary absent %13==0,
    href-attribute order flips %3==0. Descriptions carry real document
    text (XML specials blanked) so field extraction sees corpus bytes,
    not toy strings. XML assembly is ONE ordered string_agg per feed."""
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    body = F.regexp_replace(F.substring(F.col("text"), 1, 40), "[<>&]", " ")
    nl = "\n"
    rss_title = F.when(
        d % 7 == 0, F.concat(F.lit("<![CDATA[Post "), ds, F.lit("]]>"))
    ).otherwise(F.concat(F.lit("Post "), ds))
    rss_entry = F.concat(
        F.lit(nl + "  <item>" + nl + "    <title>"), rss_title,
        F.lit("</title>" + nl + "    <link>https://"), F.col("source"),
        F.lit(".test/p"), ds, F.lit("</link>"),
        F.when(
            d % 5 != 0,
            F.concat(F.lit(nl + "    <guid>urn:g:"), ds, F.lit("</guid>")),
        ).otherwise(F.lit("")),
        F.when(
            d % 9 != 0,
            F.concat(
                F.lit(nl + "    <pubDate>2026-0"),
                (1 + d % 8).cast("string"), F.lit("-15</pubDate>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 11 != 0,
            F.concat(
                F.lit(nl + "    <description>"), body,
                F.lit("</description>"),
            ),
        ).otherwise(F.lit("")),
        F.lit(nl + "  </item>"),
    )
    link_href = F.concat(
        F.lit('href="https://a.test/'), F.col("lang"), F.lit("/p"), ds,
        F.lit('"'),
    )
    atom_link = F.when(
        d % 3 == 0, F.concat(F.lit("<link "), link_href, F.lit(' rel="alternate"/>'))
    ).otherwise(F.concat(F.lit('<link rel="alternate" '), link_href, F.lit("/>")))
    atom_entry = F.concat(
        F.lit(nl + "  <entry>" + nl + "    <title>Doc "), ds,
        F.lit("</title>" + nl + "    <id>urn:doc:"), ds,
        F.lit("</id>" + nl + "    "), atom_link,
        F.lit(nl + "    <updated>2026-0"), (1 + d % 8).cast("string"),
        F.lit("-15T00:00:00Z</updated>"),
        F.when(
            d % 13 != 0,
            F.concat(F.lit(nl + "    <summary>"), body, F.lit("</summary>")),
        ).otherwise(F.lit("")),
        F.lit(nl + "  </entry>"),
    )

    def _agg(head: str, tail: str) -> F.Column:
        return F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?>' + nl + head),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("d"), F.col("e")))),
                    lambda x: x["e"],
                ),
            ),
            F.lit(nl + tail),
        )

    rss = (
        docs.where(d % 2 == 0)
        .select(F.col("source").alias("k"), d.alias("d"), rss_entry.alias("e"))
        .groupBy("k")
        .agg(
            _agg(
                '<rss version="2.0">' + nl + "<channel>" + nl
                + "  <title>feed</title>" + nl + "  <link>https://x.test/</link>",
                "</channel>" + nl + "</rss>",
            ).alias("xml")
        )
        .select(
            F.concat(F.lit("https://"), F.col("k"), F.lit(".test/feed.rss")).alias(
                "feed_url"
            ),
            "xml",
        )
    )
    atom = (
        docs.where(d % 2 == 1)
        .select(F.col("lang").alias("k"), d.alias("d"), atom_entry.alias("e"))
        .groupBy("k")
        .agg(
            _agg(
                '<feed xmlns="http://www.w3.org/2005/Atom">' + nl
                + "  <title>feed</title>" + nl
                + '  <link rel="self" href="https://a.test/feed"/>',
                "</feed>",
            ).alias("xml")
        )
        .select(
            F.concat(
                F.lit("https://a.test/"), F.col("k"), F.lit("/feed.atom")
            ).alias("feed_url"),
            "xml",
        )
    )
    return rss.unionByName(atom)


def _q_feed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed ingestion (ops.feeds.parse_feeds): per-source RSS 2.0
    and per-language Atom feeds synthesized deterministically from
    documents and parsed back with the two RE2 block regexes. Exercises:
    channel/feed wrapper exclusion (channel-level <title>/<link> must not
    leak into entries), CDATA title unwrap, RSS guid->link entry-id
    fallback, Atom href-attribute extraction under both attribute orders,
    and every field-absence NULL path. Parsing is a bounded explode
    riding the scan — pure map, no shuffle after the synth."""
    from reader_spark.ops.feeds import parse_feeds

    return parse_feeds(_synth_feed_files(spark, sf_dir))


def _q_feed_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental feed frontier (ops.feeds.feed_frontier): the parsed
    entry stream anti-joined against the persisted seen-set (entry_ids
    of doc_id % 3 == 0, including fallback link ids — the reader state
    after a previous poll). ONE left-anti equi-join on entry_id; digests
    travel, never feed bodies."""
    from reader_spark.ops.feeds import feed_frontier, parse_feeds

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    seen_id = (
        F.when(
            d % 2 == 0,
            F.when(d % 5 == 0, F.concat(
                F.lit("https://"), F.col("source"), F.lit(".test/p"),
                d.cast("string"),
            )).otherwise(F.concat(F.lit("urn:g:"), d.cast("string"))),
        )
        .otherwise(F.concat(F.lit("urn:doc:"), d.cast("string")))
    )
    seen = docs.where(d % 3 == 0).select(seen_id.alias("entry_id"))
    return feed_frontier(parse_feeds(_synth_feed_files(spark, sf_dir)), seen)


def _h(prefix):
    d = F.col("doc_id").cast("long")
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), d.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def _q_crawl_coverage_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 crawl-coverage estimate (ops.estimate.chao1_estimate, Chao
    1984 bias-corrected): per-URL capture multiplicities planted by md5
    (revisit skew), singleton/doubleton profile in one aggregate pair,
    estimate in exact integer centi-units. The discovery-budget input:
    est_richness - n_observed URLs remain unseen."""
    from reader_spark.ops.estimate import chao1_estimate

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("long")
    h = _h("cap:")
    mult = (
        F.lit(1)
        + F.when(h % 3 == 0, 1).otherwise(0)
        + F.when(h % 7 == 0, 2).otherwise(0)
    )
    caps = docs.select(
        F.concat(F.lit("u"), d.cast("string")).alias("url"),
        F.explode(F.sequence(F.lit(1), mult)).alias("__i"),
    ).drop("__i")
    return chao1_estimate(caps)


def _q_crawl_coverage_chapman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman/Lincoln-Petersen two-fleet coverage estimate
    (ops.estimate.chapman_estimate, Chapman 1951): two independently
    md5-thinned crawl samples of the same URL universe; the overlap
    count sizes the frontier neither fleet reached. Distinct + one
    equi-join; exact integer centi-units."""
    from reader_spark.ops.estimate import chapman_estimate

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("long")
    url = F.concat(F.lit("u"), d.cast("string"))
    a = docs.where(_h("capA:") % 10 < 6).select(url.alias("url"))
    b = docs.where(_h("capB:") % 10 < 6).select(url.alias("url"))
    return chapman_estimate(a, b)


QUERIES = {
    "crawl_coverage_chao1": _q_crawl_coverage_chao1,
    "crawl_coverage_chapman": _q_crawl_coverage_chapman,
    "feed_ingest": _q_feed_ingest,
    "feed_frontier": _q_feed_frontier,
}
