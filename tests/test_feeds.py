"""RSS/Atom feed ingestion + incremental frontier (ops/feeds.py)."""

from pyspark.sql import Row

from reader_spark.ops.feeds import feed_frontier, parse_feeds

RSS = """<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0">
<channel>
  <title>Channel title must not leak</title>
  <link>https://chan.test/</link>
  <item>
    <title><![CDATA[Hello <World> & Friends]]></title>
    <link>https://chan.test/p1</link>
    <guid>urn:g:1</guid>
    <pubDate>Mon, 02 Feb 2026 03:04:05 GMT</pubDate>
    <description>First post.</description>
  </item>
  <item>
    <title>No guid item</title>
    <link> https://chan.test/p2 </link>
  </item>
  <item>
    <description>id-less, link-less — frontier must drop me</description>
  </item>
</channel>
</rss>"""

ATOM = """<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Feed title must not leak</title>
  <link rel="self" href="https://a.test/feed"/>
  <entry>
    <title>Entry one</title>
    <id>urn:doc:1</id>
    <link rel="alternate" href="https://a.test/e1"/>
    <updated>2026-02-02T00:00:00Z</updated>
    <summary>sum one</summary>
  </entry>
  <entry>
    <title>Entry two</title>
    <id>urn:doc:2</id>
    <link href="https://a.test/e2" rel="alternate"/>
    <updated>2026-02-03T00:00:00Z</updated>
  </entry>
</feed>"""


def _parse(spark, xml, url="https://x.test/feed"):
    df = spark.createDataFrame([Row(feed_url=url, xml=xml)])
    return parse_feeds(df).collect()


def test_rss_fields_cdata_and_guid_fallback(spark):
    rows = sorted(_parse(spark, RSS), key=lambda r: r["title"] or "")
    assert len(rows) == 3  # channel <title>/<link> excluded from entries
    blank, cdata, noguid = rows
    assert cdata["fmt"] == "rss"
    # CDATA unwrapped, inner specials preserved verbatim
    assert cdata["title"] == "Hello <World> & Friends"
    assert cdata["entry_id"] == "urn:g:1"
    assert cdata["link"] == "https://chan.test/p1"
    assert cdata["published"] == "Mon, 02 Feb 2026 03:04:05 GMT"
    assert cdata["summary"] == "First post."
    # guid absent -> entry id falls back to the (trimmed) link
    assert noguid["entry_id"] == "https://chan.test/p2"
    assert noguid["published"] is None and noguid["summary"] is None
    # no guid AND no link -> NULL entry id
    assert blank["title"] is None and blank["entry_id"] is None


def test_atom_fields_and_href_attribute_orders(spark):
    rows = {r["entry_id"]: r for r in _parse(spark, ATOM)}
    assert set(rows) == {"urn:doc:1", "urn:doc:2"}
    e1, e2 = rows["urn:doc:1"], rows["urn:doc:2"]
    assert e1["fmt"] == "atom"
    # href extracted whether rel comes before or after it
    assert e1["link"] == "https://a.test/e1"
    assert e2["link"] == "https://a.test/e2"
    assert e1["published"] == "2026-02-02T00:00:00Z"
    assert e1["summary"] == "sum one" and e2["summary"] is None


def test_non_feed_and_empty_files_emit_nothing(spark):
    assert _parse(spark, "<html><body>not a feed</body></html>") == []
    assert _parse(spark, "") == []


def test_frontier_anti_join_and_null_drop(spark):
    entries = parse_feeds(
        spark.createDataFrame(
            [Row(feed_url="f", xml=RSS), Row(feed_url="g", xml=ATOM)]
        )
    )
    seen = spark.createDataFrame(
        [Row(entry_id="urn:g:1"), Row(entry_id="urn:doc:2")]
    )
    fresh = {r["entry_id"] for r in feed_frontier(entries, seen).collect()}
    # seen ids gone, NULL-id malformed row gone, the rest surface
    assert fresh == {"https://chan.test/p2", "urn:doc:1"}


def test_registry_queries(spark):
    import __spark_entry__ as e

    q = e.queries()
    ing = q["feed_ingest"](spark, "/root/testdata/sf0.001")
    fmts = {r["fmt"] for r in ing.select("fmt").distinct().collect()}
    assert fmts == {"rss", "atom"}
    n_all = ing.count()
    n_new = q["feed_frontier"](spark, "/root/testdata/sf0.001").count()
    assert 0 < n_new < n_all
