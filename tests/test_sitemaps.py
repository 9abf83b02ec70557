"""Sitemap parsing + recrawl scheduling (ops/sitemaps.py)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.sitemaps import parse_sitemaps, recrawl_schedule

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.test/page1 </loc>
    <lastmod>2026-03-01</lastmod>
    <changefreq>weekly</changefreq>
    <priority>0.8</priority>
  </url>
  <url>
    <loc>https://a.test/page2</loc>
  </url>
  <url>
    <loc>https://a.test/page3</loc>
    <changefreq>never</changefreq>
  </url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://a.test/sitemap-a.xml</loc>
    <lastmod>2026-01-01</lastmod>
  </sitemap>
</sitemapindex>"""


def _parse(spark, xml, url="https://a.test/sitemap.xml"):
    df = spark.createDataFrame([Row(sitemap_url=url, xml=xml)])
    return parse_sitemaps(df).collect()


def test_parse_urlset_fields_and_defaults(spark):
    rows = {r["loc"]: r for r in _parse(spark, URLSET)}
    assert set(rows) == {
        "https://a.test/page1",
        "https://a.test/page2",
        "https://a.test/page3",
    }
    p1 = rows["https://a.test/page1"]  # loc whitespace trimmed
    assert p1["kind"] == "url"
    assert p1["lastmod"] == "2026-03-01"
    assert p1["changefreq"] == "weekly" and p1["freq_hours"] == 168
    assert p1["priority_milli"] == 800
    p2 = rows["https://a.test/page2"]  # absent fields
    assert p2["lastmod"] is None and p2["changefreq"] is None
    assert p2["freq_hours"] is None
    assert p2["priority_milli"] == 500  # spec default 0.5
    p3 = rows["https://a.test/page3"]  # 'never' -> NULL hours
    assert p3["changefreq"] == "never" and p3["freq_hours"] is None


def test_parse_index_kind_and_wrapper_exclusion(spark):
    rows = _parse(spark, INDEX)
    # <sitemapindex> wrapper must NOT match as a <sitemap> entry
    assert len(rows) == 1
    assert rows[0]["kind"] == "sitemap"
    assert rows[0]["loc"] == "https://a.test/sitemap-a.xml"
    assert rows[0]["lastmod"] == "2026-01-01"


def test_parse_empty_and_malformed(spark):
    assert _parse(spark, "<urlset></urlset>") == []
    # entry with no <loc>: row survives with NULL loc (caller filters)
    rows = _parse(spark, "<urlset><url><priority>1.0</priority></url></urlset>")
    assert len(rows) == 1 and rows[0]["loc"] is None
    assert rows[0]["priority_milli"] == 1000


def _entries(spark, rows):
    return spark.createDataFrame(
        [
            Row(loc=l, lastmod=lm, freq_hours=fh, priority_milli=500)
            for l, lm, fh in rows
        ]
    )


def test_schedule_hint_only(spark):
    e = _entries(
        spark,
        [
            ("u1", "2026-06-01", 24),  # 14 days since, daily -> due
            ("u2", "2026-06-14", 168),  # 1 day since, weekly -> not due
            ("u3", None, 24),  # never fetched -> due
            ("u4", "2026-06-15", 0),  # 'always' -> due even at 0 days
            ("u5", "2026-06-01", None),  # no hint -> 168h default -> due
        ],
    )
    got = {
        r["loc"]: r
        for r in recrawl_schedule(e, as_of="2026-06-15").collect()
    }
    assert got["u1"]["is_due"] == 1 and got["u1"]["days_since"] == 14
    assert got["u2"]["is_due"] == 0
    assert got["u3"]["is_due"] == 1 and got["u3"]["days_since"] is None
    assert got["u4"]["is_due"] == 1
    assert got["u5"]["interval_hours"] == 168 and got["u5"]["is_due"] == 1


def test_schedule_observation_overrides_hint(spark):
    e = _entries(spark, [("u1", "2026-06-13", 168)])  # weekly hint: not due
    rates = spark.createDataFrame([Row(loc="u1", rate_cho=1.0)])
    # observed lambda=1/day -> 24h interval; 2 days since -> due
    got = recrawl_schedule(e, as_of="2026-06-15", rates=rates).collect()[0]
    assert got["hours_obs"] == 24
    assert got["interval_hours"] == 24 and got["is_due"] == 1
    # zero rate defers to the hint
    rates0 = spark.createDataFrame([Row(loc="u1", rate_cho=0.0)])
    got0 = recrawl_schedule(e, as_of="2026-06-15", rates=rates0).collect()[0]
    assert got0["hours_obs"] is None and got0["interval_hours"] == 168


def test_registry_queries(spark):
    import __spark_entry__ as e

    q = e.queries()
    sm = q["sitemap_ingest"](spark, "/root/testdata/sf0.001")
    kinds = {r["kind"] for r in sm.select("kind").distinct().collect()}
    assert kinds == {"url", "sitemap"}
    rs = q["recrawl_schedule"](spark, "/root/testdata/sf0.001")
    assert rs.count() > 0


def test_politeness_slots_serial_queues(spark):
    from reader_spark.ops.sitemaps import politeness_slots

    frontier = spark.createDataFrame(
        [
            Row(loc="h1/a", host="h1", priority_milli=900),
            Row(loc="h1/b", host="h1", priority_milli=100),
            Row(loc="h1/c", host="h1", priority_milli=900),  # tie -> loc asc
            Row(loc="h2/x", host="h2", priority_milli=500),
        ]
    )
    delays = spark.createDataFrame([Row(host="h1", crawl_delay_ms=2000)])
    got = {r["loc"]: r for r in politeness_slots(frontier, delays).collect()}
    # h1 order: a (900), c (900, tie by loc), b (100)
    assert got["h1/a"]["slot"] == 1 and got["h1/a"]["fetch_offset_ms"] == 0
    assert got["h1/c"]["slot"] == 2 and got["h1/c"]["fetch_offset_ms"] == 2000
    assert got["h1/b"]["slot"] == 3 and got["h1/b"]["fetch_offset_ms"] == 4000
    assert got["h1/a"]["host_makespan_ms"] == 3 * 2000
    # h2 missing from the delay dim -> default 1000 ms
    assert got["h2/x"]["crawl_delay_ms"] == 1000
    assert got["h2/x"]["host_makespan_ms"] == 1000
