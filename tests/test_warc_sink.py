"""WARC sink (sources/warc.write_warc): round-trip + determinism."""

import glob
import hashlib

from pyspark.sql import Row

from reader_spark.sources.warc import read_warc, write_warc


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=f"https://w.test/{i}",
                payload=(
                    f"<html><body>page {i}\nmultiline ünïcode body"
                    + (" WARC/1.0 embedded magic" if i == 3 else "")
                    + "</body></html>"
                ),
                status=200 if i % 3 else 404,
                capture_ts=f"2026-01-{i + 1:02d}T00:00:00Z")
            for i in range(10)
        ]
    )


def _md5s(path):
    return sorted(
        hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in glob.glob(f"{path}/shard=*/part-*")
    )


def test_roundtrip_record_for_record(spark, tmp_path):
    out = str(tmp_path / "arch")
    docs = _docs(spark)
    write_warc(docs, out, shards=3)
    back = read_warc(spark, out + "/shard=*/part-*")
    want = {
        (r["doc_id"], r["payload"], r["status"], r["capture_ts"])
        for r in docs.collect()
    }
    got = {
        (r["doc_id"], r["payload"], r["status"], r["capture_ts"])
        for r in back.collect()
    }
    # multiline + multibyte + embedded 'WARC/1.0' payloads all survive
    # Content-Length framing
    assert got == want


def test_rewrite_reproduces_bytes(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    docs = _docs(spark)
    write_warc(docs, a, shards=3)
    write_warc(docs.orderBy("status"), b, shards=3)  # input order differs
    assert _md5s(a) == _md5s(b)


def test_null_date_drops_header_not_record(spark, tmp_path):
    out = str(tmp_path / "nd")
    docs = spark.createDataFrame(
        [Row(doc_id="https://w.test/x", payload="body", status=200,
             capture_ts=None)],
        schema="doc_id string, payload string, status int, capture_ts string",
    )
    write_warc(docs, out, shards=1)
    back = read_warc(spark, out + "/shard=*/part-*").collect()
    assert len(back) == 1
    assert back[0]["payload"] == "body"
    assert back[0]["capture_ts"] is None
