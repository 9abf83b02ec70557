"""Structured Streaming extraction + multimodal plumbing + error taxonomy."""

import pytest
from pyspark.sql import functions as F

from reader_spark import fixtures
from reader_spark.functions.errors import is_retryable, split_quarantine
from reader_spark.ops.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    frame_sample_plan,
)
from reader_spark.spark.job import docs_from_rows, extract_dataframe
from reader_spark.streaming.extract_stream import start_extraction_stream

pytestmark = pytest.mark.spark


class TestStreaming:
    def test_stream_drains_docs_dir(self, spark, tmp_path):
        rows = [
            d
            for d in fixtures.fixture_docs()
            if d["doc_id"] in ("simple-static", "generic-sample", "json-payload")
        ]
        docs_dir = str(tmp_path / "docs")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        docs_from_rows(spark, rows).write.parquet(docs_dir)

        q = start_extraction_stream(spark, docs_dir, out_dir, ckpt)
        q.awaitTermination(120)

        got = spark.read.parquet(out_dir)
        assert got.count() == 3
        md = {r["doc_id"]: r["markdown"] for r in got.collect()}
        assert "# Simple Fixture Page" in md["simple-static"]

        # Restart with no new files: checkpoint prevents reprocessing.
        q2 = start_extraction_stream(spark, docs_dir, out_dir, ckpt)
        q2.awaitTermination(120)
        assert spark.read.parquet(out_dir).count() == 3


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [
            ("m1", "d1", "image", bytearray(b"fake-image-bytes-1"), ("image/png", 64, 64, None)),
            ("m2", "d1", "image", bytearray(b"fake-image-bytes-22"), ("image/jpeg", 32, 32, None)),
            ("v1", "d2", "video", bytearray(b"fake-video"), ("video/mp4", 640, 480, 3500)),
        ]
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_image_features_deterministic(self, spark, media):
        feats = {r["media_id"]: r for r in extract_image_features(media).collect()}
        assert set(feats) == {"m1", "m2"}  # video rows filtered out
        import hashlib

        data = b"fake-image-bytes-1"
        assert feats["m1"]["sha256"] == hashlib.sha256(data).hexdigest()
        assert feats["m1"]["n_bytes"] == len(data)
        assert len(feats["m1"]["thumb_8x8"]) == 64
        assert feats["m1"]["mean_byte"] == round(sum(data) / len(data), 4)

    def test_frame_sample_plan(self, spark, media):
        plan = frame_sample_plan(media, every_ms=1000).collect()
        assert [(r["media_id"], r["frame_ts_ms"]) for r in plan] == [
            ("v1", 0),
            ("v1", 1000),
            ("v1", 2000),
            ("v1", 3000),
        ]


class TestErrorTaxonomy:
    def test_retryable_mapping(self):
        assert is_retryable("TimeoutError")
        assert is_retryable("BlockedPageError")
        assert not is_retryable("EmptyDocumentError")
        assert not is_retryable("UnheardOfError")
        assert not is_retryable(None)

    def test_quarantine_split(self, spark):
        rows = [
            {"doc_id": "good", "spans": [{"kind": "html", "text": fixtures.GENERIC_SAMPLE, "media_ref": None, "offset": 0}]},
            {"doc_id": "empty", "spans": [{"kind": "html", "text": "  ", "media_ref": None, "offset": 0}]},
        ]
        extracted = extract_dataframe(docs_from_rows(spark, rows))
        ok, retryable, dead = split_quarantine(extracted)
        assert [r["doc_id"] for r in ok.collect()] == ["good"]
        assert retryable.count() == 0
        assert [r["doc_id"] for r in dead.collect()] == ["empty"]


class TestStreamingRedaction:
    def test_redacted_stream_matches_batch_redaction(self, spark, tmp_path):
        """redact=True on the stream == batch extraction + redact_spans,
        span for span — the stateless projection is cadence-agnostic. The
        media span (image) must keep its media_ref untouched."""
        from reader_spark.ops.multimodal import redact_spans

        html = (
            "<html><body><main><article><h1>Contact</h1>"
            '<img src="https://img.test/p.png" alt="portrait">'
            "<p>Write to jane.doe@corp.example or ping 10.20.30.40 "
            "or call +1 (555) 010-2233 today.</p>"
            "</article></main></body></html>"
        )
        rows = [
            {
                "doc_id": "pii-doc",
                "spans": [
                    {
                        "kind": "html",
                        "text": html,
                        "media_ref": None,
                        "offset": 0,
                    }
                ],
            }
        ]
        docs_dir = str(tmp_path / "docs")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        docs_from_rows(spark, rows).write.parquet(docs_dir)

        q = start_extraction_stream(spark, docs_dir, out_dir, ckpt, redact=True)
        q.awaitTermination(120)
        streamed = spark.read.parquet(out_dir).select("doc_id", "spans")

        batch = redact_spans(
            extract_dataframe(docs_from_rows(spark, rows))
        ).select("doc_id", "spans")
        got = {r.doc_id: r.spans for r in streamed.collect()}
        want = {r.doc_id: r.spans for r in batch.collect()}
        assert got == want

        spans = got["pii-doc"]
        text_all = " ".join(s.text for s in spans if s.text)
        assert "<EMAIL>" in text_all and "<IP>" in text_all
        assert "<PHONE>" in text_all
        assert "jane.doe@corp.example" not in text_all
        refs = [s.media_ref for s in spans if s.media_ref]
        assert refs == ["https://img.test/p.png"]
