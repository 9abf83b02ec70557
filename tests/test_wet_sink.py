"""WET conversion sink (sources/warc.write_wet / read_wet): the Common
Crawl text-sidecar format — round-trip, determinism, type filtering."""

import glob
import hashlib

from pyspark.sql import Row

from reader_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    read_wet,
    write_warc,
    write_wet,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(
                doc_id=f"https://w.test/{i}",
                text=(
                    f"extracted text {i}\nünïcode line"
                    + (" WARC/1.0 embedded magic" if i == 3 else "")
                ),
                capture_ts=f"2026-02-{i + 1:02d}T00:00:00Z",
            )
            for i in range(10)
        ]
    )


def _md5s(path):
    return sorted(
        hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in glob.glob(f"{path}/shard=*/part-*")
    )


def test_roundtrip_record_for_record(spark, tmp_path):
    out = str(tmp_path / "wet")
    docs = _docs(spark)
    write_wet(docs, out, shards=3, date_col="capture_ts")
    back = {
        r["doc_id"]: r
        for r in read_wet(spark, out + "/shard=*/part-*").collect()
    }
    want = {r["doc_id"]: r for r in docs.collect()}
    assert set(back) == set(want)
    for k, r in back.items():
        assert r["payload"] == want[k]["text"]
        assert r["capture_ts"] == want[k]["capture_ts"]
        assert r["status"] == 200  # conversion records carry no status


def test_rewrite_reproduces_bytes(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    docs = _docs(spark)
    write_wet(docs, a, shards=3)
    write_wet(docs.orderBy("doc_id", ascending=False), b, shards=3)
    assert _md5s(a) == _md5s(b)


def test_refers_to_urn_is_stable_and_multibyte_framing_holds(spark, tmp_path):
    out = str(tmp_path / "urn")
    docs = _docs(spark).limit(1)
    write_wet(docs, out, shards=1)
    blob = open(glob.glob(out + "/shard=*/part-*")[0], "rb").read()
    assert b"WARC-Type: conversion" in blob
    assert b"WARC-Refers-To: urn:xxh64:" in blob
    assert b"Content-Type: text/plain" in blob
    # octet framing: multibyte text parses back whole
    recs = parse_warc_records(blob, record_type="conversion")
    assert len(recs) == 1 and "ünïcode" in recs[0]["payload"]


def test_response_and_conversion_readers_do_not_cross(spark, tmp_path):
    wet_dir = str(tmp_path / "wet")
    warc_dir = str(tmp_path / "warc")
    docs = _docs(spark)
    write_wet(docs, wet_dir, shards=1)
    resp = docs.selectExpr(
        "doc_id", "text AS payload", "200 AS status"
    )
    write_warc(resp, warc_dir, shards=1, date_col=None)
    # a WARC reader over WET files sees nothing, and vice versa
    assert read_warc(spark, wet_dir + "/shard=*/part-*").count() == 0
    assert read_wet(spark, warc_dir + "/shard=*/part-*").count() == 0
