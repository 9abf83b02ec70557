"""BFS crawl dataflow over a synthetic page corpus (reference semantics:
crawler.ts:49-148 — depth/maxPages limits, dedup, admission filters)."""

import pytest

from reader_spark.spark.crawler import crawl

pytestmark = pytest.mark.spark


def page(url, title, links, extra=""):
    anchors = "".join(f'<a href="{l}">x</a>' for l in links)
    return (
        url,
        f"<html><head><title>{title}</title></head><body>{anchors}{extra}</body></html>",
    )


@pytest.fixture(scope="module")
def site(spark):
    rows = [
        page(
            "https://site.test/start",
            "Start",
            [
                "/blog/a",
                "/blog/b",
                "https://offsite.test/x",  # cross-domain: filtered
                "/privacy-policy",  # non-content: filtered
                "#frag",  # fragment: skipped at extraction
            ],
        ),
        page("https://site.test/blog/a", "Blog A", ["/blog/c", "/blog/b"]),
        page("https://site.test/blog/b", "Blog B", ["/blog/a"]),
        page("https://site.test/blog/c", "Blog C", []),
        page("https://site.test/privacy-policy", "Privacy", []),
        page("https://offsite.test/x", "Offsite", []),
    ]
    return spark.createDataFrame(rows, "url string, payload string")


def test_depth_zero_is_seed_only(spark, site):
    out = crawl(spark, site, "https://site.test/start", max_depth=0).collect()
    assert [(r["url"], r["depth"]) for r in out] == [("https://site.test/start", 0)]
    assert out[0]["title"] == "Start"


def test_depth_one_admits_content_links_only(spark, site):
    out = crawl(spark, site, "https://site.test/start", max_depth=1).collect()
    urls = {r["url"] for r in out}
    assert urls == {
        "https://site.test/start",
        "https://site.test/blog/a",
        "https://site.test/blog/b",
    }
    assert all(r["depth"] <= 1 for r in out)


def test_depth_two_reaches_c_without_revisits(spark, site):
    out = crawl(spark, site, "https://site.test/start", max_depth=2).collect()
    urls = [r["url"] for r in out]
    assert "https://site.test/blog/c" in urls
    assert len(urls) == len(set(urls))  # visited-set dedup (J1)


def test_max_pages_limit_bfs_order(spark, site):
    out = crawl(spark, site, "https://site.test/start", max_depth=2, max_pages=2).collect()
    assert len(out) == 2
    assert out[0]["url"] == "https://site.test/start"  # depth order first


def test_exclude_patterns(spark, site):
    out = crawl(
        spark,
        site,
        "https://site.test/start",
        max_depth=1,
        exclude_patterns=[r"/blog/b"],
    ).collect()
    urls = {r["url"] for r in out}
    assert "https://site.test/blog/b" not in urls
    assert "https://site.test/blog/a" in urls


def test_robots_rules_enforced(spark, site):
    robots = """
User-agent: *
Disallow: /blog/b
Allow: /blog/
"""
    out = crawl(
        spark,
        site,
        "https://site.test/start",
        max_depth=1,
        robots_txt=robots,
    ).collect()
    urls = {r["url"] for r in out}
    # Allow takes precedence over Disallow (isPathAllowed allow-first),
    # so /blog/b survives via the broader Allow: /blog/ rule.
    assert "https://site.test/blog/b" in urls

    out2 = crawl(
        spark,
        site,
        "https://site.test/start",
        max_depth=1,
        robots_txt="User-agent: *\nDisallow: /blog/b\n",
    ).collect()
    urls2 = {r["url"] for r in out2}
    assert "https://site.test/blog/b" not in urls2
    assert "https://site.test/blog/a" in urls2


def test_include_patterns(spark, site):
    # crawler.test.ts "respects includePatterns filter": discovered links
    # must match at least one include pattern; the seed always crawls.
    out = crawl(
        spark, site, "https://site.test/start", max_depth=2,
        include_patterns=[r"/blog/a"],
    ).collect()
    urls = [r["url"] for r in out]
    assert urls == ["https://site.test/start", "https://site.test/blog/a"]


def test_missing_page_continues(spark, site):
    # crawler.test.ts "continues crawling when fetchPage returns null":
    # a discovered link whose page is absent from the corpus must not kill
    # the crawl — other branches still complete.
    smaller = site.where("url != 'https://site.test/blog/b'")
    out = crawl(spark, smaller, "https://site.test/start", max_depth=2).collect()
    urls = {r["url"] for r in out}
    assert "https://site.test/blog/a" in urls
    assert "https://site.test/blog/c" in urls  # reached THROUGH a, past missing b
    assert "https://site.test/blog/b" not in urls


def test_crawl_metadata_aggregate(spark, site):
    # A2 (crawl-types.ts CrawlMetadata): totalUrls + maxDepth from one agg.
    from pyspark.sql import functions as F

    out = crawl(spark, site, "https://site.test/start", max_depth=2)
    meta = out.agg(
        F.count("*").alias("totalUrls"), F.max("depth").alias("maxDepth")
    ).head()
    assert meta["totalUrls"] == 4  # start, a, b, c
    assert meta["maxDepth"] == 2
