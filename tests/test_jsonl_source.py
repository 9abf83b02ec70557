"""Tolerant JSONL source (reader_spark.sources.jsonl)."""

import json

from pyspark.sql import types as T

from reader_spark.sources.jsonl import read_jsonl_docs


def _write(tmp_path, lines, name="docs.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(tmp_path)


class TestReadJsonlDocs:
    def test_clean_round_trip(self, spark, tmp_path):
        lines = [
            json.dumps({"doc_id": "a", "text": "hello world", "source": "s1"}),
            json.dumps({"doc_id": "b", "text": "zweite zeile", "source": "s2"}),
        ]
        got = {
            r.doc_id: r for r in read_jsonl_docs(spark, _write(tmp_path, lines)).collect()
        }
        assert got["a"].text == "hello world" and got["a"].error is None
        assert got["b"].source == "s2"

    def test_malformed_line_becomes_error_row(self, spark, tmp_path):
        lines = [
            json.dumps({"doc_id": "a", "text": "fine", "source": "s"}),
            "{this is not json",
        ]
        rows = read_jsonl_docs(spark, _write(tmp_path, lines)).collect()
        errors = [r for r in rows if r.error is not None]
        assert len(rows) == 2
        assert [r.error for r in errors] == ["MalformedJsonError"]
        # malformed rows carry no partial field noise
        assert errors[0].doc_id is None and errors[0].text is None

    def test_missing_required_field_tagged(self, spark, tmp_path):
        lines = ['{"text": "no id here"}', '{"doc_id": "x"}']
        rows = read_jsonl_docs(spark, _write(tmp_path, lines)).collect()
        assert sorted(r.error for r in rows) == ["MissingFieldError"] * 2
        # parsed-but-incomplete rows keep what they DID carry
        assert any(r.text == "no id here" for r in rows)

    def test_blank_lines_skipped(self, spark, tmp_path):
        lines = [json.dumps({"doc_id": "a", "text": "t", "source": "s"}), "", "   "]
        assert read_jsonl_docs(spark, _write(tmp_path, lines)).count() == 1

    def test_schema_drift_both_directions(self, spark, tmp_path):
        # unknown extra field ignored; declared extra field absent -> NULL
        lines = [
            json.dumps(
                {"doc_id": "a", "text": "t", "source": "s", "surprise": [1, 2]}
            ),
            json.dumps({"doc_id": "b", "text": "t2", "source": "s"}),
        ]
        out = read_jsonl_docs(
            spark,
            _write(tmp_path, lines),
            extra_fields={"lang": T.StringType()},
        )
        got = {r.doc_id: r for r in out.collect()}
        assert got["a"].error is None and got["a"].lang is None
        assert got["b"].error is None

    def test_unicode_survives(self, spark, tmp_path):
        text = "naïve café — 中文 ☃"
        lines = [json.dumps({"doc_id": "u", "text": text, "source": "s"})]
        row = read_jsonl_docs(spark, _write(tmp_path, lines)).head()
        assert row.text == text
