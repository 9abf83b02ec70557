"""Streaming checkpoint recovery: a restarted stream with the same
checkpoint processes only NEW input — every doc lands exactly once (the
streaming twin of the batch job's anti-join resume)."""

import pytest

pytestmark = pytest.mark.spark


def test_restart_processes_only_new_files(spark, tmp_path):
    from reader_spark import fixtures
    from reader_spark.spark.job import docs_from_rows
    from reader_spark.streaming.extract_stream import start_extraction_stream

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = [d for d in fixtures.fixture_docs() if d["doc_id"] != "pdf-two-column"]
    half = len(rows) // 2

    docs_from_rows(spark, rows[:half]).write.mode("append").parquet(docs_dir)
    q = start_extraction_stream(spark, docs_dir, out_dir, ckpt)
    q.awaitTermination(120)

    first = spark.read.parquet(out_dir).count()
    assert first == half

    # new arrivals land as new files; SAME checkpoint -> only they process
    docs_from_rows(spark, rows[half:]).write.mode("append").parquet(docs_dir)
    q2 = start_extraction_stream(spark, docs_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    out = spark.read.parquet(out_dir)
    assert out.count() == len(rows)
    # exactly once: no doc_id appears twice across the two runs
    assert out.select("doc_id").distinct().count() == len(rows)
