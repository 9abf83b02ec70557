"""SURT keys + CDX capture index (ops/cdx.py)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.cdx import cdx_dedup_captures, cdx_index, surt_key_col


def _keys(spark, urls):
    df = spark.createDataFrame([Row(url=u) for u in urls])
    return [
        r["k"] for r in df.select(surt_key_col(F.col("url")).alias("k")).collect()
    ]


def test_surt_canonicalization_rules(spark):
    got = _keys(
        spark,
        [
            "https://www.Example.COM:443/A/B?b=2&a=1#frag",
            "http://example.com",  # empty path -> '/'
            "http://sub.example.com:8080/x",  # non-default port kept
            "http://www3.example.com:80/p",  # wwwN strip + default port
            "https://user:pw@example.com/secret",  # userinfo dropped
            "garbage",  # unparseable -> NULL
        ],
    )
    assert got[0] == "com,example)/a/b?a=1&b=2"
    assert got[1] == "com,example)/"
    assert got[2] == "com,example,sub:8080)/x"
    assert got[3] == "com,example)/p"
    assert got[4] == "com,example)/secret"
    assert got[5] is None


def test_surt_sorts_query_params_stably(spark):
    a, b = _keys(
        spark,
        ["http://e.com/p?z=1&a=2&m=3", "http://e.com/p?m=3&z=1&a=2"],
    )
    assert a == b == "com,e)/p?a=2&m=3&z=1"


def test_cdx_index_and_revisit_dedup(spark):
    caps = spark.createDataFrame(
        [
            Row(url="http://E.com/p", ts="20260101000000", mime="text/html",
                status=200, payload="same body"),
            Row(url="http://e.com/p", ts="20260102000000", mime="text/html",
                status=200, payload="same body"),  # revisit, same digest
            Row(url="http://e.com/p", ts="20260103000000", mime="text/html",
                status=200, payload="changed body"),
        ]
    )
    idx = cdx_index(caps)
    rows = idx.collect()
    assert {r["urlkey"] for r in rows} == {"com,e)/p"}
    assert len({r["digest"] for r in rows}) == 2
    dd = {r["digest"]: r for r in cdx_dedup_captures(idx).collect()}
    same = [r for r in dd.values() if r["n_captures"] == 2][0]
    assert same["first_ts"] == "20260101000000"
    changed = [r for r in dd.values() if r["n_captures"] == 1][0]
    assert changed["first_ts"] == "20260103000000"


def test_registry_query(spark):
    import __spark_entry__ as e

    df = e.queries()["cdx_index"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows
    # the unparseable arm yields NULL urlkeys, everything else keyed
    assert any(r["urlkey"] is None for r in rows)
    assert any(r["urlkey"] is not None for r in rows)
    # digest is 64-hex sha256
    r = next(r for r in rows if r["urlkey"] is not None)
    assert len(r["digest"]) == 64


def test_cdx_merge_revisit_and_change(spark):
    from reader_spark.ops.cdx import cdx_merge

    base = spark.createDataFrame(
        [Row(urlkey="com,e)/p", digest="d1", first_ts="20260101",
             n_captures=2, length=10)]
    )
    new = spark.createDataFrame(
        [
            Row(urlkey="com,e)/p", digest="d1", first_ts="20260615",
                n_captures=1, length=10),  # revisit, same content
            Row(urlkey="com,e)/p", digest="d2", first_ts="20260615",
                n_captures=1, length=13),  # changed content
        ]
    )
    got = {r["digest"]: r for r in cdx_merge(base, new).collect()}
    assert got["d1"]["n_captures"] == 3
    assert got["d1"]["first_ts"] == "20260101"  # earliest survives
    assert got["d2"]["n_captures"] == 1
    assert got["d2"]["first_ts"] == "20260615"


def test_cdx_merge_registry_query(spark):
    import __spark_entry__ as e

    df = e.queries()["cdx_merge"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert any(r["n_captures"] == 2 for r in rows)  # revisits counted
    assert any(r["n_captures"] == 1 for r in rows)
