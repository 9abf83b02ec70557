"""WARC-style archive source: record splitting, corruption tolerance, and
end-to-end extraction equality with the direct pipeline."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


PAGES = [
    (
        "https://warc.test/a",
        "<html><head><title>A</title></head><body><main><h1>Alpha</h1>"
        '<p>First page with <a href="/next">a relative link</a>.</p>'
        "</main></body></html>",
        200,
    ),
    (
        "https://warc.test/b",
        "<html><body><main><h1>Beta</h1><p>Second page.</p></main></body></html>",
        200,
    ),
    (
        "https://warc.test/c",
        "<html><body><main><h1>Gamma</h1><p>Third page.</p></main></body></html>",
        404,
    ),
]


@pytest.fixture(scope="module")
def warc_dir(spark, tmp_path_factory):
    from reader_spark.sources.warc import synth_warc_bytes

    d = tmp_path_factory.mktemp("warc")
    (d / "part-0.warc").write_bytes(synth_warc_bytes(PAGES[:2]))
    # second archive starts with a CORRUPT record (bad Content-Length),
    # then a valid one — the splitter must resync, not raise
    corrupt = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://warc.test/broken\r\n"
        b"Content-Length: not-a-number\r\n\r\n<html>x</html>\r\n\r\n"
    )
    (d / "part-1.warc").write_bytes(corrupt + synth_warc_bytes(PAGES[2:]))
    return str(d)


def test_split_records_and_skip_corrupt(spark, warc_dir):
    from reader_spark.sources.warc import read_warc

    rows = {r["doc_id"]: r for r in read_warc(spark, warc_dir).collect()}
    assert set(rows) == {p[0] for p in PAGES}  # corrupt record dropped
    assert rows["https://warc.test/c"]["status"] == 404
    assert "Alpha" in rows["https://warc.test/a"]["payload"]
    assert rows["https://warc.test/b"]["archive"].endswith("part-0.warc")


def test_non_numeric_status_defaults_not_raises(tmp_path):
    """Tolerant-splitter contract: a garbled WARC-Status header must produce
    a default-status row, not fail the archive."""
    from reader_spark.sources.warc import parse_warc_records, synth_warc_bytes

    blob = synth_warc_bytes([("https://warc.test/ok", "<html>fine</html>", 200)])
    garbled = blob.replace(b"WARC-Status: 200", b"WARC-Status: NN")
    assert garbled != blob
    records = parse_warc_records(garbled)
    assert len(records) == 1
    assert records[0]["status"] == 200
    assert records[0]["doc_id"] == "https://warc.test/ok"


def test_warc_extraction_equals_direct_pipeline(spark, warc_dir):
    from reader_spark.config import DEFAULT_CONFIG
    from reader_spark.extract.pipeline import extract_document
    from reader_spark.sources.warc import read_warc, warc_to_docs
    from reader_spark.spark.job import extract_dataframe

    docs = warc_to_docs(read_warc(spark, warc_dir))
    # base_url_prefix='' -> base URL IS the capture URI
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in extract_dataframe(docs, base_url_prefix="").collect()
    }
    for uri, html, _status in PAGES:
        want = extract_document(uri, html, uri, DEFAULT_CONFIG, "html")
        assert got[uri] == [(s.kind, s.text, s.media_ref) for s in want.spans]
    # the relative link absolutified against the capture URI
    a_spans = dict((k, t) for k, t, _m in got["https://warc.test/a"])
    assert any("https://warc.test/next" in t for _k, t, _m in got["https://warc.test/a"])


def test_latest_capture_wins(spark, tmp_path):
    from reader_spark.sources.warc import read_warc, synth_warc_bytes, warc_to_docs

    d = tmp_path / "recrawl"
    d.mkdir()
    (d / "a.warc").write_bytes(
        synth_warc_bytes(
            [
                ("https://warc.test/page", "<html><body>OLD</body></html>", 200,
                 "2026-01-01T00:00:00Z"),
                ("https://warc.test/page", "<html><body>NEW</body></html>", 200,
                 "2026-06-01T00:00:00Z"),
            ]
        )
    )
    docs = warc_to_docs(read_warc(spark, str(d))).collect()
    assert len(docs) == 1  # duplicate captures collapse
    assert "NEW" in docs[0]["spans"][0]["text"]

    both = warc_to_docs(read_warc(spark, str(d)), dedup_captures=False).collect()
    assert len(both) == 2


def test_gzip_archives_per_record_members(spark, tmp_path):
    # Production .warc.gz: each record its own gzip member, concatenated.
    import gzip

    from reader_spark.sources.warc import read_warc, synth_warc_bytes

    d = tmp_path / "gz"
    d.mkdir()
    members = b"".join(
        gzip.compress(synth_warc_bytes([p])) for p in PAGES
    )
    (d / "part-0.warc.gz").write_bytes(members)
    # one corrupt member mid-stream: parser keeps everything before it
    ok = gzip.compress(synth_warc_bytes([PAGES[0]]))
    (d / "part-1.warc.gz").write_bytes(ok + b"\x1f\x8bgarbage" )

    rows = read_warc(spark, str(d / "part-0.warc.gz")).collect()
    assert {r["doc_id"] for r in rows} == {p[0] for p in PAGES}
    rows1 = read_warc(spark, str(d / "part-1.warc.gz")).collect()
    assert [r["doc_id"] for r in rows1] == [PAGES[0][0]]


def test_crawl_over_archive(spark, tmp_path):
    """Composition: the BFS crawl dataflow runs over an ARCHIVED site
    (read_warc supplies the page corpus) — offline re-crawls of a capture,
    no fetch layer involved."""
    from pyspark.sql import functions as F

    from reader_spark.sources.warc import read_warc, synth_warc_bytes
    from reader_spark.spark.crawler import crawl

    site = [
        ("https://arch.test/start",
         '<html><head><title>Start</title></head><body>'
         '<a href="/blog/a">a</a><a href="https://other.test/x">off</a></body></html>', 200),
        ("https://arch.test/blog/a",
         '<html><head><title>A</title></head><body><a href="/blog/b">b</a></body></html>', 200),
        ("https://arch.test/blog/b",
         "<html><head><title>B</title></head><body>end</body></html>", 200),
    ]
    d = tmp_path / "arch"
    d.mkdir()
    (d / "site.warc").write_bytes(synth_warc_bytes(site))

    pages = read_warc(spark, str(d)).select(
        F.col("doc_id").alias("url"), "payload"
    )
    out = crawl(spark, pages, "https://arch.test/start", max_depth=2)
    assert [(r["url"], r["depth"], r["title"]) for r in out.collect()] == [
        ("https://arch.test/start", 0, "Start"),
        ("https://arch.test/blog/a", 1, "A"),
        ("https://arch.test/blog/b", 2, "B"),
    ]
