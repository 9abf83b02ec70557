"""URL template / DUST mining (ops/urltemplates.py)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.urltemplates import url_template_col, url_templates


def _t(spark, url):
    df = spark.createDataFrame([Row(u=url)])
    return df.select(url_template_col(F.col("u")).alias("t")).collect()[0]["t"]


def test_template_transform(spark):
    assert _t(spark, "https://h.test/p/123/9") == "https://h.test/p/{N}/{N}"
    assert (
        _t(spark, "https://h.test/?sid=0123456789abcdef0123456789abcdef")
        == "https://h.test/?sid={H}"
    )
    assert (
        _t(spark, "https://h.test/x/550e8400-e29b-41d4-a716-446655440000")
        == "https://h.test/x/{U}"
    )
    # short hex-alphabet words don't fold; case folds first
    assert _t(spark, "https://h.test/CAFE/babe") == "https://h.test/cafe/babe"


def test_dust_rollup(spark):
    rows = []
    for i in range(5):
        rows.append(
            Row(
                host="h",
                url=f"https://h.test/cal/?sid={'%032x' % (i + 1)}",
                digest="same",
            )
        )
    for i in range(3):
        rows.append(
            Row(host="h", url=f"https://h.test/p/{i}", digest=f"d{i}")
        )
    out = {
        r["template"]: r
        for r in url_templates(spark.createDataFrame(rows)).collect()
    }
    dust = out["https://h.test/cal/?sid={H}"]
    assert (dust["n_urls"], dust["n_digests"], dust["dup_milli"]) == (5, 1, 800)
    real = out["https://h.test/p/{N}"]
    assert (real["n_urls"], real["n_digests"], real["dup_milli"]) == (3, 3, 0)
    assert real["sample_url"] == "https://h.test/p/0"


def test_registry(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    assert "url_templates" in qs
    assert "url_templates" in entrymod.oracle_sql()
    rows = qs["url_templates"](spark, "/root/testdata/sf0.001").collect()
    # one template per host: trap hosts fold sid to {H}, clean to {N}s
    assert len(rows) == 20
    for r in rows:
        if "{H}" in r["template"]:
            assert r["dup_milli"] >= 500
        else:
            assert r["dup_milli"] == 0
