"""URL-matching parallel-document mining (ops/urlbitext.py): marker
stripping forms, key equality across forms, elections, non-markers."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.urlbitext import url_lang_key, url_parallel_pairs

pytestmark = pytest.mark.spark

M = ("en", "fr", "de")


def _keys(spark, urls):
    df = spark.createDataFrame([Row(url=u) for u in urls])
    lk = url_lang_key(F.col("url"), M)
    return [
        (r["k"]["lang"], r["k"]["key"])
        for r in df.select(lk.alias("k")).collect()
    ]


def test_marker_stripping_forms(spark):
    got = _keys(spark, [
        "https://en.site.com/about",
        "https://site.com/fr/about",
        "HTTPS://WWW.site.com/about",
        "https://docs.site.com/about",     # non-marker subdomain
        "https://site.com/blog/about",     # non-marker segment
        "https://en.site.com/fr/about",    # subdomain wins, one strip
    ])
    assert got[0] == ("en", "site.com/about")
    assert got[1] == ("fr", "site.com/about")
    assert got[2] == ("", "site.com/about")
    assert got[3] == ("", "docs.site.com/about")
    assert got[4] == ("", "site.com/blog/about")
    assert got[5] == ("en", "site.com/fr/about")


def test_pairs_and_election(spark):
    docs = spark.createDataFrame([
        Row(doc_id=5, url="https://en.site.com/p"),
        Row(doc_id=3, url="https://en.site.com/p"),   # dup en, min wins
        Row(doc_id=7, url="https://site.com/fr/p"),
        Row(doc_id=9, url="https://de.site.com/p"),
        Row(doc_id=11, url="https://site.com/p"),     # no marker
        Row(doc_id=13, url="https://en.other.com/q"), # lone language
    ])
    pairs = {
        (r["lang_a"], r["doc_a"], r["lang_b"], r["doc_b"])
        for r in url_parallel_pairs(docs, markers=M).collect()
    }
    assert ("en", 3, "fr", 7) in pairs          # elected min en doc
    assert ("de", 9, "en", 3) in pairs
    assert ("de", 9, "fr", 7) in pairs
    assert len(pairs) == 3                      # lone/unmarked never pair
    assert not any(5 in (a, b) for _, a, _, b in pairs)


def test_param_validation(spark):
    docs = spark.createDataFrame([Row(doc_id=1, url="https://a.com/x")])
    with pytest.raises(ValueError):
        url_parallel_pairs(docs, markers=())
