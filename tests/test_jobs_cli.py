"""spark-submit entrypoints driven end-to-end as SUBPROCESSES (S4/S5
analogue) — the real CLI surface, isolated from the suite's shared
SparkSession (each job stops its own session on exit)."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(script: str, *args: str) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", script), *args],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    from reader_spark import fixtures
    from reader_spark.spark.job import docs_from_rows

    p = str(tmp_path_factory.mktemp("jobs") / "docs")
    rows = [d for d in fixtures.fixture_docs() if d["doc_id"] != "pdf-two-column"]
    docs_from_rows(spark, rows).write.parquet(p)
    return p


@pytest.fixture(scope="module")
def warc_path(tmp_path_factory):
    from reader_spark.sources.warc import synth_warc_bytes

    d = tmp_path_factory.mktemp("jobs_warc")
    recs = [
        (
            f"https://jobs.test/{i}",
            f"<html><body><main><h1>J{i}</h1><p>job test page {i} body "
            f"with words</p></main></body></html>",
            200,
        )
        for i in range(4)
    ]
    (d / "a.warc").write_bytes(synth_warc_bytes(recs))
    return str(d)


def test_extract_job_docs_and_resume(docs_path, tmp_path):
    wh = str(tmp_path / "wh")
    m1 = run_job(
        "extract_job.py", "--input", docs_path, "--warehouse", wh,
        "--run-id", "r1", "--master", "local[4]",
    )
    assert m1["failedDocs"] == 0 and m1["successfulDocs"] == m1["totalDocs"] > 0

    # second submission: everything committed -> resume processes nothing
    m2 = run_job(
        "extract_job.py", "--input", docs_path, "--warehouse", wh,
        "--run-id", "r2", "--master", "local[4]",
    )
    assert m2["totalDocs"] == 0


def test_extract_job_warc(warc_path, tmp_path):
    wh = str(tmp_path / "whw")
    m = run_job(
        "extract_job.py", "--input", warc_path, "--input-format", "warc",
        "--warehouse", wh, "--run-id", "w1", "--master", "local[4]",
    )
    assert m["successfulDocs"] == 4


def test_corpus_prep_job(spark, docs_path, tmp_path):
    out = str(tmp_path / "clean")
    m = run_job(
        "corpus_prep_job.py", "--input", docs_path, "--output", out,
        "--min-tokens", "3", "--master", "local[4]",
    )
    assert 0 < m["kept_docs"] <= m["input_docs"]
    assert spark.read.parquet(out).count() == m["kept_docs"]
