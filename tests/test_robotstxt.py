"""Corpus-scale robots.txt parsing (ops/robotstxt.py, RFC 9309)."""

from pyspark.sql import Row

from reader_spark.ops.robotstxt import robots_host_dim, robots_parse

ROBOTS = """# header comment
Disallow: /orphan
User-agent: *
Disallow: /private  # trailing comment
Crawl-delay: 2
Allow: /public

User-agent: badbot
User-agent: otherbot
Disallow: /

Sitemap: https://h.test/sitemap.xml
"""


def _parse(spark, content=ROBOTS, host="h"):
    return robots_parse(
        spark.createDataFrame([Row(host=host, content=content)])
    )


def test_groups_agents_and_orphan_drop(spark):
    rows = _parse(spark).collect()
    got = {(r["agent"], r["directive"], r["value"]) for r in rows}
    # orphan directive before any group is ignored
    assert not any(v == "/orphan" for _, _, v in got)
    # group 1: '*' gets all three directives, trailing comment stripped
    assert ("*", "disallow", "/private") in got
    assert ("*", "crawl-delay", "2") in got
    assert ("*", "allow", "/public") in got
    # group 2: BOTH agents of the multi-agent group get the directive
    assert ("badbot", "disallow", "/") in got
    assert ("otherbot", "disallow", "/") in got
    # sitemap is group-independent
    assert (None, "sitemap", "https://h.test/sitemap.xml") in got
    # '*' never inherits group-2 rules
    assert ("*", "disallow", "/") not in got


def test_host_dim_aggregates(spark):
    dim = {r["host"]: r for r in robots_host_dim(_parse(spark)).collect()}
    h = dim["h"]
    assert h["crawl_delay_ms"] == 2000
    assert h["n_disallow"] == 1 and h["n_allow"] == 1
    assert h["full_block"] == 0  # '*' is not blocked; badbot is
    assert h["n_sitemaps"] == 1
    bad = {
        r["host"]: r
        for r in robots_host_dim(_parse(spark), agent="badbot").collect()
    }
    assert bad["h"]["full_block"] == 1
    assert bad["h"]["crawl_delay_ms"] == 1000  # no delay -> default


def test_empty_and_comment_only_files(spark):
    assert _parse(spark, content="").count() == 0
    assert _parse(spark, content="# nothing\n\n# more").count() == 0


def test_registry_query(spark):
    import __spark_entry__ as e

    df = e.queries()["robots_parse"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows
    agents = {r["agent"] for r in rows}
    assert {"*", "badbot", "otherbot", None} <= agents
