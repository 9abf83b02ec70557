"""CETR (Weninger et al., WWW 2010) — tag-ratio content extraction.

Feature math, binomial smoothing with edge renormalization, the
per-document mean cut, and the applied extract summary. All arithmetic
is integer micro-units so expectations are exact.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.cetr import cetr_classify, cetr_extract, cetr_features


def _lines(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=d, line_no=n, html=h) for d, n, h in rows]
    )


def test_features_tag_count_and_text_chars(spark):
    df = _lines(
        spark,
        [
            (1, 0, '<div class="nav"><a href="/x">hi</a></div>'),
            (1, 1, "plain text line"),
            (1, 2, "<p></p>"),
        ],
    )
    got = {
        r["line_no"]: r
        for r in cetr_features(df).collect()
    }
    # 4 tags, text 'hi'
    assert got[0]["tag_count"] == 4 and got[0]["text_chars"] == 2
    assert got[0]["tr_micro"] == 2 * 1_000_000 // 4
    # no tags: denominator clamps to 1 -> TR = chars
    assert got[1]["tag_count"] == 0
    assert got[1]["tr_micro"] == 15 * 1_000_000
    # all-tag line: zero text
    assert got[2]["text_chars"] == 0 and got[2]["tr_micro"] == 0


def test_single_line_doc_smoothing_identity(spark):
    # one line: only the center tap (weight 6) is present, so the
    # renormalized smoothing is the identity.
    df = _lines(spark, [(7, 0, "lonely line")])
    row = cetr_classify(df).collect()[0]
    assert row["smoothed_micro"] == row["tr_micro"]
    assert row["deriv_micro"] == 0
    # mean cut is strict: a single line never exceeds its own mean
    assert row["is_content"] == 0


def test_smoothing_edge_renormalization(spark):
    # two lines with TRs a and b: each edge line has taps (6, 4) ->
    # smoothed = (6a + 4b) // 10 and (4a + 6b) // 10.
    df = _lines(spark, [(3, 0, "aaaa"), (3, 1, "bbbbbbbbbb")])
    a, b = 4 * 1_000_000, 10 * 1_000_000
    got = {r["line_no"]: r for r in cetr_classify(df).collect()}
    assert got[0]["smoothed_micro"] == (6 * a + 4 * b) // 10
    assert got[1]["smoothed_micro"] == (4 * a + 6 * b) // 10


def test_mean_cut_flags_text_spike(spark):
    # nav / nav / long bare text / nav: the bare-text line's smoothed TR
    # is far above the document mean, the nav lines far below.
    nav = '<ul><li><a href="/a">x</a></li><li><a href="/b">y</a></li></ul>'
    body = "word " * 40
    rows = [(9, i, nav) for i in range(4)]
    rows += [(9, 4, body)]
    rows += [(9, i, nav) for i in range(5, 9)]
    got = {
        r["line_no"]: r["is_content"]
        for r in cetr_classify(_lines(spark, rows)).collect()
    }
    assert got[4] == 1
    # nav beyond the kernel radius of the spike stays boilerplate; the
    # radius-2 neighbours may bleed above the mean (expected CETR
    # smoothing behaviour), so assert only the distant lines.
    assert got[0] == 0 and got[1] == 0 and got[7] == 0 and got[8] == 0


def test_extract_summary_and_all_boilerplate_md5(spark):
    nav = '<a href="/x">n</a>'
    body = "real content " * 20
    df = _lines(
        spark,
        [(1, 0, nav), (1, 1, body), (1, 2, nav)]
        + [(2, 0, nav)],  # single-line doc -> all boilerplate
    )
    got = {r["doc_id"]: r for r in cetr_extract(df).collect()}
    assert got[1]["n_lines"] == 3 and got[1]["n_content"] == 1
    # md5 of the tag-stripped surviving line, page order
    import hashlib

    assert (
        got[1]["content_md5"]
        == hashlib.md5(body.encode()).hexdigest()
    )
    assert got[2]["n_content"] == 0
    assert got[2]["content_md5"] == hashlib.md5(b"").hexdigest()


def test_deriv_micro_forward_difference(spark):
    df = _lines(spark, [(5, 0, "aa"), (5, 1, "bbbbbbbb")])
    got = {r["line_no"]: r for r in cetr_classify(df).collect()}
    assert got[0]["deriv_micro"] == abs(
        got[1]["smoothed_micro"] - got[0]["smoothed_micro"]
    )
    assert got[1]["deriv_micro"] == 0  # last line: no forward neighbour


def test_registry_query_nonempty_and_schema(spark):
    import __spark_entry__ as e

    df = e.queries()["cetr_classify"](spark, "/root/testdata/sf0.001")
    assert df.columns == [
        "doc_id",
        "line_no",
        "tag_count",
        "text_chars",
        "tr_micro",
        "smoothed_micro",
        "deriv_micro",
        "is_content",
    ]
    rows = df.limit(50).collect()
    assert rows
    assert {r["is_content"] for r in df.select("is_content").distinct().collect()} == {0, 1}
