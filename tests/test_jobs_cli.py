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


def run_job_raw(script: str, *args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", script), *args],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )


@pytest.fixture(scope="module")
def many_docs_path(spark, tmp_path_factory):
    """A few thousand docs so a mid-run cancel has in-flight work to hit."""
    from reader_spark.spark.job import docs_from_rows

    p = str(tmp_path_factory.mktemp("jobs_many") / "docs")
    body = "".join(
        f"<p>paragraph {j} with some words to parse and serialize</p>"
        for j in range(40)
    )
    rows = [
        {
            "doc_id": f"d{i:05d}",
            "spans": [
                {
                    "kind": "html",
                    "text": f"<html><body><main><h1>Doc {i}</h1>{body}</main></body></html>",
                    "media_ref": None,
                    "offset": 0,
                }
            ],
        }
        for i in range(6000)
    ]
    docs_from_rows(spark, rows).write.parquet(p)
    return p


def test_deadline_aborts_without_corrupting_warehouse(many_docs_path, tmp_path):
    """W5/T4: a run past its --deadline exits with code 3 (job group
    cancelled by the watchdog) and commits NO partial table — the follow-up
    run without a deadline resumes cleanly and extracts everything."""
    wh = str(tmp_path / "wh")
    aborted = run_job_raw(
        "extract_job.py", "--input", many_docs_path, "--warehouse", wh,
        "--run-id", "dl1", "--deadline", "1", "--master", "local[2]",
    )
    assert aborted.returncode == 3, aborted.stderr[-1500:]
    payload = json.loads(aborted.stdout.strip().splitlines()[-1])
    assert payload["error"] == "deadline_exceeded"
    # atomic job commit: the cancelled run left no committed extracted table
    extracted_dir = os.path.join(wh, "extracted")
    committed = os.path.isdir(extracted_dir) and any(
        n == "_SUCCESS" or n.endswith(".parquet")
        for n in os.listdir(extracted_dir)
    )
    assert not committed

    finished = run_job(
        "extract_job.py", "--input", many_docs_path, "--warehouse", wh,
        "--run-id", "dl2", "--master", "local[2]",
    )
    assert finished["totalDocs"] == 6000


def test_abort_controller_signal_cancels(spark):
    """T4 abort-on-disconnect: SIGTERM marks the run aborted and cancels its
    job group (end-to-end cancellation is covered by the deadline test —
    the signal path shares the same abort())."""
    import signal
    import time

    from reader_spark.spark.abort import AbortController

    old_term = signal.getsignal(signal.SIGTERM)
    old_int = signal.getsignal(signal.SIGINT)
    try:
        ctl = AbortController(spark, "sig-test").install()
        os.kill(os.getpid(), signal.SIGTERM)
        time.sleep(0.1)  # handler runs at the next bytecode boundary
        assert ctl.aborted == f"aborted_by_signal_{int(signal.SIGTERM)}"
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)


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


def test_extract_job_jsonl(tmp_path):
    import json

    d = tmp_path / "jsonl_in"
    d.mkdir()
    lines = [
        json.dumps(
            {
                "doc_id": f"https://jobs.test/j{i}",
                "text": f"<html><body><main><h1>J{i}</h1><p>jsonl page {i} "
                f"body words</p></main></body></html>",
                "source": "jobs",
            }
        )
        for i in range(3)
    ]
    lines.append("{corrupt line")  # must be skipped with a report, not fatal
    (d / "docs.jsonl").write_text("\n".join(lines) + "\n")
    wh = str(tmp_path / "whj")
    proc = run_job_raw(
        "extract_job.py", "--input", str(d), "--input-format", "jsonl",
        "--warehouse", wh, "--run-id", "j1", "--master", "local[4]",
        "--base-url-prefix", "",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = json.loads(proc.stdout.strip().splitlines()[-1])
    assert m["successfulDocs"] == 3
    assert "skipping 1 unparseable" in proc.stderr


def test_corpus_prep_job(spark, docs_path, tmp_path):
    out = str(tmp_path / "clean")
    m = run_job(
        "corpus_prep_job.py", "--input", docs_path, "--output", out,
        "--min-tokens", "3", "--master", "local[4]",
    )
    assert 0 < m["kept_docs"] <= m["input_docs"]
    assert spark.read.parquet(out).count() == m["kept_docs"]


def test_corpus_prep_job_incremental_index_roundtrip(spark, docs_path, tmp_path):
    """Batch 1 writes the persisted band index; batch 2 (same input — every
    doc an exact near-dup of the ingested corpus) reads it and drops all of
    them without re-sketching the old corpus. The rolled-forward index
    unions old + batch-2 keepers."""
    out1, out2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    idx1, idx2 = str(tmp_path / "idx1"), str(tmp_path / "idx2")
    m1 = run_job(
        "corpus_prep_job.py", "--input", docs_path, "--output", out1,
        "--min-tokens", "3", "--master", "local[4]",
        "--write-dedup-index", idx1,
    )
    assert m1["kept_docs"] > 0 and m1["dropped_incremental"] == 0
    index = spark.read.parquet(idx1)
    assert set(index.columns) == {"doc", "band_hashes", "shingle_set"}
    assert index.count() == m1["kept_docs"]

    m2 = run_job(
        "corpus_prep_job.py", "--input", docs_path, "--output", out2,
        "--min-tokens", "3", "--master", "local[4]",
        "--dedup-index", idx1, "--write-dedup-index", idx2,
    )
    # identical batch: every doc that survives the gate is a near-dup of
    # the ingested corpus and must be dropped by the index check
    assert m2["dropped_incremental"] == m1["kept_docs"]
    assert m2["kept_docs"] == 0
    assert spark.read.parquet(idx2).count() == m1["kept_docs"]  # union, no new keepers


def test_corpus_prep_job_rejects_same_index_paths(docs_path, tmp_path):
    out = str(tmp_path / "c")
    idx = str(tmp_path / "idx")
    proc = run_job_raw(
        "corpus_prep_job.py", "--input", docs_path, "--output", out,
        "--min-tokens", "3", "--master", "local[4]",
        "--dedup-index", idx, "--write-dedup-index", idx,
    )
    assert proc.returncode != 0
    assert "must differ" in proc.stderr


def test_ann_index_job_build_query_matches_inline(spark, tmp_path):
    """Persisted IVF-PQ index discipline: build job writes
    codes(partitioned by cell)+model.json; query job reads ONLY the index
    and must return exactly what the one-shot ivfadc_topk computes with
    the same seeded training."""
    import json as _json

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    index = str(tmp_path / "ann_index")
    m1 = run_job(
        "ann_index_job.py", "build",
        "--embeddings", emb_path, "--index", index,
        "--cells", "4", "--m", "8", "--k", "8", "--iters", "1",
        "--master", "local[4]",
    )
    assert m1["indexed_vectors"] > 0 and m1["cells"] >= 2
    assert os.path.isfile(os.path.join(index, "model.json"))
    # codes table is cell-partitioned on disk
    assert any(
        d.startswith("cell=") for d in os.listdir(os.path.join(index, "codes"))
    )

    queries_path = str(tmp_path / "queries")
    emb = spark.read.parquet(emb_path)
    emb.limit(5).write.parquet(queries_path)
    out = str(tmp_path / "hits")
    m2 = run_job(
        "ann_index_job.py", "query",
        "--index", index, "--queries", queries_path, "--output", out,
        "--topk", "5", "--nprobe", "2", "--master", "local[4]",
    )
    assert m2["queries"] == 5 and m2["result_rows"] == 25

    from reader_spark.ops.ann import ivfadc_topk

    with open(os.path.join(index, "model.json")) as fh:
        model = _json.load(fh)
    inline = ivfadc_topk(
        emb, spark.read.parquet(queries_path),
        model["centroids"], model["codebooks"], k=5, nprobe=2,
    )
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, inline.collect()))
    assert got == want


def test_curation_job_full_pipeline(tmp_path):
    out = str(tmp_path / "curated")
    summary = run_job(
        "curation_job.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out,
        "--target-lang", "en",
        "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
        "--master", "local[4]",
    )
    assert summary["input_docs"] > 0
    assert 0 < summary["kept_docs"] < summary["input_docs"]
    # every stage accounted; totals reconcile
    dropped = (summary["dropped_quality"] + summary["dropped_dsir"]
               + summary["dropped_semdedup"])
    assert summary["kept_docs"] == summary["input_docs"] - dropped
    import glob
    assert glob.glob(out + "/*.parquet")


def test_curation_job_quality_only(tmp_path):
    out = str(tmp_path / "curated_q")
    summary = run_job(
        "curation_job.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out,
        "--min-score", "0.0",
        "--master", "local[4]",
    )
    assert summary["kept_docs"] == summary["input_docs"]
    assert summary["dropped_quality"] == 0


def test_dataset_card_job(tmp_path):
    out = str(tmp_path / "card.json")
    card = run_job(
        "dataset_card_job.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out,
        "--master", "local[4]",
    )
    assert card["n_docs"] == 500
    assert card["exact_dup_rate"] == 0.0
    assert 0 < card["line_dup_rate"] < 1
    assert 0 < card["quality_keep_rate"] < 1
    assert {l["lang"] for l in card["languages"]} == {"de", "en", "es", "fr", "zh"}
    assert sum(l["n_docs"] for l in card["languages"]) == 500
    assert len(card["top_sources"]) == 5
    import json as _json
    with open(out) as fh:
        assert _json.load(fh)["n_docs"] == 500


def test_compact_job_merges_and_range_clusters(tmp_path, spark):
    # fragment the documents table into ~64 tiny files
    frag = str(tmp_path / "frag")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(64).write.parquet(frag)

    out = str(tmp_path / "compacted")
    summary = run_job(
        "compact_job.py",
        "--input", frag,
        "--output", out,
        "--target-mb", "64",
        "--sort-by", "doc_id",
        "--master", "local[4]",
    )
    assert summary["rows"] == 500
    assert summary["in_files"] == 64
    assert summary["out_files"] < summary["in_files"]

    # range clustering: per-file doc_id [min,max] intervals must be disjoint
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "doc_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint -> footer stats prune whole files


def test_extract_job_via_spark_submit_pyfiles(docs_path, tmp_path):
    """The north-rule launch shape, proven for real: spark-submit
    --py-files reader_spark.zip from OUTSIDE the repo checkout. The job
    script is copied to a bare temp dir (so its repo-root sys.path
    fallback points at nothing) and PYTHONPATH is scrubbed — every
    `import reader_spark`, driver and executor side, must resolve from
    the shipped zip or the job dies with ModuleNotFoundError."""
    import shutil

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    from scripts.make_pyfiles_zip import build

    zip_path = build(str(tmp_path / "reader_spark.zip"))
    outside = tmp_path / "outside"
    outside.mkdir()
    job_copy = str(outside / "extract_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "extract_job.py"), job_copy)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    wh = str(tmp_path / "wh")
    r = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            job_copy,
            "--input", docs_path,
            "--warehouse", wh,
            "--run-id", "pyfiles1",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(outside),
        env=env,
    )
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-1500:])
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["failedDocs"] == 0
    assert metrics["successfulDocs"] == metrics["totalDocs"] > 0


@pytest.fixture(scope="module")
def vlm_docs(spark, tmp_path_factory):
    """12 interleaved raw docs on one domain: unique heading + body (with
    an email in half of them), a hero image in 8, and a shared footer
    paragraph on every doc (domain boilerplate by construction)."""
    from reader_spark.spark.job import docs_from_rows

    base = str(tmp_path_factory.mktemp("vlm"))
    rows = []
    for i in range(12):
        img = (
            f'<img src="https://img.test/{i}/hero.png" alt="hero {i}">'
            if i % 3 != 2
            else ""
        )
        email = " write to user%d@mail.test today" % i if i % 2 == 0 else ""
        html = (
            f"<html><body><main><article><h1>Doc {i}</h1>{img}"
            f"<p>Unique body text number {i} with plenty of words{email}.</p>"
            f"<p>All rights reserved by the example site footer.</p>"
            f"</article></main></body></html>"
        )
        rows.append(
            {
                "doc_id": f"vlm-{i:02d}",
                "spans": [
                    {"kind": "html", "text": html, "media_ref": None, "offset": 0}
                ],
            }
        )
    docs_from_rows(spark, rows).write.parquet(base + "/docs")
    spark.createDataFrame(
        [(f"vlm-{i:02d}", "site.test") for i in range(12)],
        "doc_id string, domain string",
    ).write.parquet(base + "/domains")
    return base


def test_vlm_prep_job_full_pipeline(spark, vlm_docs, tmp_path):
    out = str(tmp_path / "samples_full")
    summary = run_job(
        "vlm_prep_job.py",
        "--input", vlm_docs + "/docs",
        "--output", out,
        "--domains", vlm_docs + "/domains",
        "--redact",
        "--align-threshold", "1.01",  # cosine <= 1.0: every image must drop
        "--master", "local[4]",
    )
    assert summary["input_docs"] == 12 and summary["samples"] == 12
    assert summary["quarantined"] == 0
    assert summary["boilerplate_spans_dropped"] == 12  # the shared footer
    assert summary["misaligned_media_dropped"] == 8
    assert summary["media_total"] == 0
    assert summary["truncated_spans"] == 0
    got = spark.read.parquet(out)
    samples = {r.doc_id: r.sample for r in got.collect()}
    assert "<image_" not in samples["vlm-00"]
    assert "footer" not in samples["vlm-00"]
    assert "<EMAIL>" in samples["vlm-00"]  # redacted in place
    assert "mail.test" not in samples["vlm-00"]


def test_vlm_prep_job_keeps_media_without_filters(spark, vlm_docs, tmp_path):
    out = str(tmp_path / "samples_plain")
    summary = run_job(
        "vlm_prep_job.py",
        "--input", vlm_docs + "/docs",
        "--output", out,
        "--master", "local[4]",
    )
    assert summary["samples"] == 12
    assert summary["media_total"] == 8
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert "<image_0>" in got["vlm-00"].sample
    assert list(got["vlm-00"].media_refs) == ["https://img.test/0/hero.png"]
    assert "user0@mail.test" in got["vlm-00"].sample  # no --redact
    assert "footer" in got["vlm-00"].sample  # no --domains


def test_export_job_round_trip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "export")
    summary = run_job(
        "export_job.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out,
        "--shards", "4",
        "--master", "local[4]",
    )
    n_in = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert summary["rows"] == n_in
    manifest = json.loads(open(out + "/manifest.json").read())
    assert manifest["rows"] == n_in
    assert sum(s["rows"] for s in manifest["shards"].values()) == n_in
    assert set(manifest["shards"]) <= {"0", "1", "2", "3"}

    # round-trip through the JSONL source: every doc comes back clean
    from pyspark.sql import types as T

    from reader_spark.sources.jsonl import read_jsonl_docs

    back = read_jsonl_docs(
        spark,
        out + "/data",
        extra_fields={"lang": T.StringType(), "n_chars": T.LongType()},
    )
    assert back.where("error IS NOT NULL").count() == 0
    orig = {
        (str(r.doc_id), r.text, r.lang, r.source, r.n_chars)
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).collect()
    }
    got = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in back.collect()
    }
    assert got == orig


def test_export_job_is_deterministic(tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    for out in (a, b):
        run_job(
            "export_job.py",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out,
            "--shards", "4",
            "--master", "local[4]",
        )
    ma = json.loads(open(a + "/manifest.json").read())
    mb = json.loads(open(b + "/manifest.json").read())
    assert ma == mb  # same shard membership AND content fingerprints


def test_vlm_prep_job_resume_appends_only_remainder(spark, vlm_docs, tmp_path):
    """The checkpoint discipline: a partial output + --resume processes
    only the anti-joined remainder and APPENDS, ending with the full
    sample set exactly once per doc."""
    out = str(tmp_path / "samples_resume")
    half = str(tmp_path / "half_docs")
    docs = spark.read.parquet(vlm_docs + "/docs")
    docs.where("doc_id < 'vlm-06'").write.parquet(half)

    first = run_job(
        "vlm_prep_job.py",
        "--input", half, "--output", out, "--master", "local[4]",
    )
    assert first["samples"] == 6

    second = run_job(
        "vlm_prep_job.py",
        "--input", vlm_docs + "/docs", "--output", out,
        "--resume", "--master", "local[4]",
    )
    assert second["resumed_skipped"] == 6
    assert second["input_docs"] == 6      # only the remainder ran
    assert second["samples"] == 12        # total committed after append
    got = spark.read.parquet(out)
    assert got.count() == 12
    assert got.select("doc_id").distinct().count() == 12


def test_ann_index_job_binary_build_query(spark, tmp_path):
    """--kind binary: compact sign-bit index persisted once, queries get
    Hamming candidates from the codes + exact rerank fetched by id; the
    results must equal the inline binary_hamming_topk answer."""
    idx = str(tmp_path / "bin_index")
    out = str(tmp_path / "bin_hits")
    qpath = str(tmp_path / "bin_queries")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.where("vec_id < 3").write.parquet(qpath)

    built = run_job(
        "ann_index_job.py", "build", "--kind", "binary",
        "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
        "--index", idx, "--master", "local[4]",
    )
    assert built["kind"] == "binary"
    assert built["indexed_vectors"] == emb.count()
    schema = spark.read.parquet(idx + "/codes").schema.simpleString()
    assert schema == "struct<corpus_id:bigint,code:array<bigint>>"

    queried = run_job(
        "ann_index_job.py", "query",
        "--index", idx, "--queries", qpath, "--output", out,
        "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
        "--topk", "5", "--master", "local[4]",
    )
    assert queried["kind"] == "binary" and queried["queries"] == 3
    got = spark.read.parquet(out)
    assert got.count() == 15  # 3 queries x top-5

    from reader_spark.ops.ann import binary_hamming_topk

    qv = [float(v) for v in emb.where("vec_id = 1").head()["embedding"]]
    inline = [
        (r["vec_id"], r["cosine"])
        for r in binary_hamming_topk(emb, qv, k=5, candidates=50).collect()
    ]
    via_index = [
        (r["corpus_id"], r["cosine"])
        for r in got.where("query_id = 1").orderBy("rank").collect()
    ]
    assert via_index == inline


def test_vlm_prep_job_resume_reloads_boilerplate_list(spark, vlm_docs, tmp_path):
    """The boilerplate deletion list is a corpus statistic: a resumed run
    must reuse the FIRST run's persisted list (sidecar parquet), not
    recompute it over only the remainder — so interrupted+resumed output
    equals an uninterrupted run (r4 advice)."""
    fresh_out = str(tmp_path / "samples_fresh")
    run_job(
        "vlm_prep_job.py",
        "--input", vlm_docs + "/docs", "--output", fresh_out,
        "--domains", vlm_docs + "/domains", "--master", "local[4]",
    )
    fresh = {
        r.doc_id: r.sample
        for r in spark.read.parquet(fresh_out).collect()
    }

    out = str(tmp_path / "samples_interrupted")
    half = str(tmp_path / "half_docs_boiler")
    docs = spark.read.parquet(vlm_docs + "/docs")
    docs.where("doc_id < 'vlm-06'").write.parquet(half)
    first = run_job(
        "vlm_prep_job.py",
        "--input", half, "--output", out,
        "--domains", vlm_docs + "/domains", "--master", "local[4]",
    )
    assert first["boilerplate_list"] == "computed"
    second = run_job(
        "vlm_prep_job.py",
        "--input", vlm_docs + "/docs", "--output", out,
        "--domains", vlm_docs + "/domains",
        "--resume", "--master", "local[4]",
    )
    assert second["boilerplate_list"] == "reloaded"
    assert second["this_run"]["samples"] == 6
    assert second["samples"] == 12
    got = {r.doc_id: r.sample for r in spark.read.parquet(out).collect()}
    assert got == fresh  # interrupted+resumed == uninterrupted, byte-equal


def test_tokenize_job_learn_concat_then_reuse_nextfit(spark, tmp_path):
    """tokenize_job: learn merges -> persisted artifact -> exact counts
    -> packed sequences; a second run RELOADS the learned table and
    packs no-split next-fit bins."""
    out1 = str(tmp_path / "tok1")
    first = run_job(
        "tokenize_job.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out1, "--learn", "10",
        "--seq-len", "512", "--shards", "8", "--master", "local[4]",
    )
    assert first["merges_source"] == "learned" and first["n_merges"] == 10
    assert first["input_docs"] == 500
    assert first["packed_tokens"] == first["total_tokens"]  # lossless layout
    assert first["sequences"] > 0
    import json as _json
    import os as _os

    merges = _json.load(open(_os.path.join(out1, "merges.json")))
    assert len(merges) == 10
    counts = spark.read.parquet(out1 + "/counts")
    assert counts.count() == 500

    out2 = str(tmp_path / "tok2")
    second = run_job(
        "tokenize_job.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out2, "--merges", out1 + "/merges.parquet",
        "--seq-len", "512", "--shards", "8",
        "--mode", "nextfit", "--master", "local[4]",
    )
    assert second["merges_source"] == "reloaded" and second["n_merges"] == 10
    assert second["bins"] > 0
    assert 0 < second["mean_fill_frac"] <= 1
    packed = spark.read.parquet(out2 + "/packed")
    assert packed.count() == 500  # no-split: one row per doc


def test_refresh_job_extracts_only_added_and_changed(tmp_path, spark):
    """refresh_job: delta sidecar written; only added+changed docs
    reach the extracted table; unchanged/removed never re-extract."""
    import copy

    from reader_spark import fixtures
    from reader_spark.spark.job import docs_from_rows

    rows = [d for d in fixtures.fixture_docs() if d["doc_id"] != "pdf-two-column"]
    assert len(rows) >= 4
    removed_id = rows[1]["doc_id"]
    added_id = rows[-1]["doc_id"]
    changed_id = rows[0]["doc_id"]

    old_rows = [r for r in rows[:-1]]  # 'added_id' missing from old
    new_rows = [copy.deepcopy(r) for r in rows if r["doc_id"] != removed_id]
    for r in new_rows:
        if r["doc_id"] == changed_id:
            r["spans"][0]["text"] += "<p>updated content here</p>"

    old_p = str(tmp_path / "old")
    new_p = str(tmp_path / "new")
    docs_from_rows(spark, old_rows).write.parquet(old_p)
    docs_from_rows(spark, new_rows).write.parquet(new_p)

    wh = str(tmp_path / "wh")
    summary = run_job(
        "refresh_job.py",
        "--old", old_p,
        "--new", new_p,
        "--warehouse", wh,
        "--run-id", "refresh1",
        "--master", "local[4]",
    )
    assert summary["delta"]["added"] == 1
    assert summary["delta"]["changed"] == 1
    assert summary["delta"]["removed"] == 1
    assert summary["delta"]["unchanged"] == len(rows) - 3

    extracted = spark.read.parquet(wh + "/extracted")
    got_ids = {r.doc_id for r in extracted.select("doc_id").distinct().collect()}
    assert got_ids == {added_id, changed_id}

    delta = spark.read.parquet(wh + "/refresh_delta")
    statuses = {r.doc_id: r.status for r in delta.collect()}
    assert statuses[removed_id] == "removed"
    assert statuses[added_id] == "added"
    assert statuses[changed_id] == "changed"


def test_schedule_job_frontier_and_lineage(tmp_path, spark):
    """schedule_job: sitemap parse -> change-rate join -> due ranking;
    observation overrides the publisher hint; --top caps the frontier;
    index children land in sitemap_frontier; lineage adds up."""
    from pyspark.sql import Row

    urlset = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://s.test/u1</loc><lastmod>2026-06-01</lastmod>
       <changefreq>daily</changefreq><priority>0.9</priority></url>
  <url><loc>https://s.test/u2</loc><lastmod>2026-06-14</lastmod>
       <changefreq>weekly</changefreq><priority>0.8</priority></url>
  <url><loc>https://s.test/u3</loc></url>
</urlset>"""
    index = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://s.test/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""
    sm_p = str(tmp_path / "sitemaps")
    spark.createDataFrame(
        [
            Row(sitemap_url="https://s.test/sitemap.xml", xml=urlset),
            Row(sitemap_url="https://s.test/sitemap_index.xml", xml=index),
        ]
    ).write.parquet(sm_p)

    # u2 changed on every visit -> observed ~8h interval, overriding the
    # weekly hint (1 day since lastmod would NOT be due under 168h)
    hist_rows = [
        Row(url="https://s.test/u2", r=i, status="changed") for i in range(8)
    ] + [
        Row(url="https://s.test/u1", r=i,
            status="changed" if i < 2 else "unchanged")
        for i in range(8)
    ]
    hist_p = str(tmp_path / "history")
    spark.createDataFrame(hist_rows).write.parquet(hist_p)

    robots_p = str(tmp_path / "robots")
    spark.createDataFrame(
        [Row(host="s.test",
             content="User-agent: *\nCrawl-delay: 3\nDisallow: /tmp\n")]
    ).write.parquet(robots_p)

    wh = str(tmp_path / "wh")
    summary = run_job(
        "schedule_job.py",
        "--sitemaps", sm_p,
        "--history", hist_p,
        "--robots", robots_p,
        "--as-of", "2026-06-15",
        "--warehouse", wh,
        "--run-id", "sched1",
        "--top", "2",
        "--master", "local[4]",
    )
    assert summary["n_url_entries"] == 3
    assert summary["n_index_entries"] == 1
    assert summary["n_with_observation"] == 2
    assert summary["n_due"] == 3  # u1 stale+daily, u2 via observation, u3 never fetched
    assert summary["n_frontier"] == 2  # capped by --top

    frontier = spark.read.parquet(wh + "/crawl_frontier")
    rows = {r["loc"]: r for r in frontier.collect()}
    # top-2 by priority desc: u1 (900) and u2 (800); u3 (500) cut
    assert set(rows) == {"https://s.test/u1", "https://s.test/u2"}
    assert rows["https://s.test/u2"]["hours_obs"] == 8
    assert rows["https://s.test/u2"]["interval_hours"] == 8

    children = spark.read.parquet(wh + "/sitemap_frontier")
    assert [r["loc"] for r in children.collect()] == [
        "https://s.test/sitemap-2.xml"
    ]

    # robots-driven politeness slots over the committed frontier:
    # both frontier URLs share host s.test (delay 3 s) -> serial queue
    slots = {r["loc"]: r for r in
             spark.read.parquet(wh + "/fetch_slots").collect()}
    assert len(slots) == 2
    assert sorted(r["fetch_offset_ms"] for r in slots.values()) == [0, 3000]
    assert all(r["host_makespan_ms"] == 6000 for r in slots.values())
    assert summary["max_host_makespan_ms"] == 6000


def test_archive_job_index_extract_and_clean_warc(tmp_path, spark, warc_path):
    """archive_job: CDX sidecar, extraction through the real pipeline,
    cleaned markdown re-archived as WARC; --merge-index rolls a second
    crawl into the same index with revisit counts."""
    wh = str(tmp_path / "wh")
    summary = run_job(
        "archive_job.py",
        "--input", warc_path,
        "--warehouse", wh,
        "--run-id", "arch1",
        "--clean-archive",
        "--wet",
        "--master", "local[4]",
    )
    assert summary["n_captures"] == 4
    assert summary["n_index_rows"] == 4
    assert summary["extracted"]["totalDocs"] == 4
    assert summary["extracted"]["failedDocs"] == 0

    cdx = spark.read.parquet(wh + "/cdx")
    rows = cdx.collect()
    assert all(r["n_captures"] == 1 for r in rows)
    assert all(r["urlkey"].startswith("test,jobs)/") for r in rows)

    # cleaned markdown came back as a readable WARC
    from reader_spark.sources.warc import read_warc

    back = read_warc(spark, summary["clean_warc"] + "/shard=*/part-*")
    got = {r["doc_id"]: r["payload"] for r in back.collect()}
    assert len(got) == 4
    assert any("J0" in p or "job test page 0" in p for p in got.values())

    # and the extracted text as a WET sidecar (conversion records only:
    # the response reader must see nothing there)
    from reader_spark.sources.warc import read_wet

    wet = read_wet(spark, summary["wet"] + "/shard=*/part-*")
    wet_rows = {r["doc_id"]: r["payload"] for r in wet.collect()}
    assert set(wet_rows) == set(got)
    assert read_warc(spark, summary["wet"] + "/shard=*/part-*").count() == 0

    # second pass over the SAME warcs with --merge-index: revisits
    summary2 = run_job(
        "archive_job.py",
        "--input", warc_path,
        "--warehouse", wh,
        "--run-id", "arch2",
        "--merge-index",
        "--master", "local[4]",
    )
    assert summary2["n_index_rows"] == 4
    merged = {r["urlkey"]: r for r in spark.read.parquet(wh + "/cdx").collect()}
    assert all(r["n_captures"] == 2 for r in merged.values())


@pytest.fixture(scope="module")
def sft_turns(spark, tmp_path_factory):
    """12 conversations: 9 well-formed unique, 1 malformed (starts with
    assistant), 2 sharing a duplicate assistant response (conv 10 is the
    (conv,turn)-minimal canonical copy, conv 11 the duplicate)."""
    from pyspark.sql import Row

    rows = []
    for c in range(9):
        rows += [
            Row(conv_id=c, turn_idx=0, role="user", content=f"question {c}"),
            Row(conv_id=c, turn_idx=1, role="assistant",
                content=f"unique answer {c}"),
        ]
    rows += [
        Row(conv_id=9, turn_idx=0, role="assistant", content="hi first"),
        Row(conv_id=9, turn_idx=1, role="user", content="malformed"),
    ]
    for c in (10, 11):
        rows += [
            Row(conv_id=c, turn_idx=0, role="user", content=f"dup ask {c}"),
            Row(conv_id=c, turn_idx=1, role="assistant",
                content="The Shared  Answer"),
        ]
    path = str(tmp_path_factory.mktemp("sft") / "turns")
    spark.createDataFrame(rows).write.parquet(path)
    return path


def test_sft_prep_job_full_pipeline(spark, sft_turns, tmp_path):
    out = str(tmp_path / "sft_full")
    summary = run_job(
        "sft_prep_job.py",
        "--input", sft_turns,
        "--output", out,
        "--pack", "64",
        "--master", "local[4]",
    )
    assert summary["input_convs"] == 12
    assert summary["hygiene_dropped_convs"] == 1  # conv 9
    assert summary["dup_dropped_convs"] == 1      # conv 11 (10 canonical)
    assert summary["convs"] == 10
    got = {r.conv_id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == set(range(9)) | {10}
    r0 = got[0]
    assert r0.chat_text == (
        "<|user|>question 0<|end|><|assistant|>unique answer 0<|end|>"
    )
    [(s, e)] = [(x["start"], x["end"]) for x in r0.trainable_spans]
    assert r0.chat_text[s:e] == "unique answer 0"
    packs = spark.read.parquet(out + "_packs")
    assert summary["packed_sequences"] >= 1
    # packed segments cover every kept conversation's chars exactly
    import pyspark.sql.functions as F
    per_conv = {r["conv_id"]: r["t"] for r in packs.groupBy("conv_id")
                .agg(F.sum("n_tokens").alias("t")).collect()}
    assert per_conv == {c: got[c].n_chars for c in got}


def test_sft_prep_job_resume_matches_uninterrupted(spark, sft_turns, tmp_path):
    """First run on half the conversations, resume with the full input:
    committed output equals a fresh full run — including a new conv that
    duplicates an ALREADY-COMMITTED response (caught via the persisted
    digest index, not re-election)."""
    from pyspark.sql import Row

    full = spark.read.parquet(sft_turns)
    half_path = str(tmp_path / "turns_half")
    full.where("conv_id < 6").write.parquet(half_path)
    # extended input: everything + conv 20 duplicating conv 3's answer
    ext_path = str(tmp_path / "turns_ext")
    extra = spark.createDataFrame([
        Row(conv_id=20, turn_idx=0, role="user", content="late ask"),
        Row(conv_id=20, turn_idx=1, role="assistant",
            content="UNIQUE  answer 3"),  # normalizes == conv 3's
    ])
    full.unionByName(extra).write.parquet(ext_path)

    out_r = str(tmp_path / "sft_resume")
    s1 = run_job("sft_prep_job.py", "--input", half_path,
                 "--output", out_r, "--master", "local[4]")
    assert s1["convs"] == 6
    s2 = run_job("sft_prep_job.py", "--input", ext_path,
                 "--output", out_r, "--resume", "--master", "local[4]")
    assert s2["resumed_skipped"] == 6
    assert s2["convs"] == 10  # 12 - malformed - dup11 - dup20 + committed

    out_f = str(tmp_path / "sft_fresh")
    run_job("sft_prep_job.py", "--input", ext_path,
            "--output", out_f, "--master", "local[4]")
    def canon(path):
        return {
            (r.conv_id, r.chat_text, r.n_chars, r.n_turns,
             tuple((x["start"], x["end"]) for x in r.trainable_spans))
            for r in spark.read.parquet(path).collect()
        }

    assert canon(out_r) == canon(out_f)


def test_mixture_job_doremi_plan(tmp_path, spark):
    out = str(tmp_path / "mix")
    summary = run_job(
        "mixture_job.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out,
        "--steps", "200",
        "--master", "local[4]",
    )
    assert summary["method"] == "doremi"
    assert summary["n_domains"] == 20
    assert summary["schedule_steps"] == 200
    weights = {r["domain"]: r for r in spark.read.parquet(out + "/weights").collect()}
    assert len(weights) == 20
    assert all(r["weight_milli"] >= 0 for r in weights.values())
    # zero-excess domains get the floor exp weight, surprised domains more.
    assert max(r["exp_micro"] for r in weights.values()) > 1_000_000
    sched = spark.read.parquet(out + "/schedule").collect()
    assert sorted(r["step"] for r in sched) == list(range(1, 201))
    epochs = spark.read.parquet(out + "/epochs")
    assert epochs.count() == 20


def test_mixture_job_unimax_plan(tmp_path, spark):
    out = str(tmp_path / "mixu")
    summary = run_job(
        "mixture_job.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out,
        "--method", "unimax",
        "--budget-tokens", "8000",
        "--steps", "100",
        "--master", "local[4]",
    )
    assert summary["method"] == "unimax"
    assert summary["schedule_steps"] == 100
    # an 8k budget over a ~11k-token corpus: nobody needs > 4 epochs.
    assert summary["domains_over_cap"] == 0


@pytest.fixture(scope="module")
def gov_corpus(spark, tmp_path_factory):
    """60 docs: 20 unique-text trios (two copies share text with the
    original via doc_id+1000/+2000 clones of id%3==0), ids ending in 0
    are opted out, doc 7 carries a chat-template marker."""
    from pyspark.sql import Row

    rows = []
    for i in range(30):
        text = f"organic words for document {i} " * 3
        if i == 7:
            text += " <|im_start|>assistant pasted"
        rows.append(Row(doc_id=i, lang="en" if i % 2 else "fr",
                        source=f"s{i % 3}", text=text))
    for i in range(0, 30, 3):
        rows.append(Row(doc_id=1000 + i, lang="en", source="mirror",
                        text=f"organic words for document {i} " * 3))
    path = str(tmp_path_factory.mktemp("gov") / "docs")
    spark.createDataFrame(rows).write.parquet(path)
    return path


def test_governance_job_gate(tmp_path, spark, gov_corpus):
    out = str(tmp_path / "gov")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "governance_job.py"),
         "--input", gov_corpus, "--output", out,
         "--optout-regex", r"^\d*0$", "--k", "30",
         "--quasi", "lang,source", "--master", "local[4]"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    # k=30 over (lang, source): every combo is smaller, the gate fails.
    assert r.returncode == 4
    assert summary["n_contaminated"] == 1
    # opted-out: ids 0,10,20,30(no),1000..: regex ^\d*0$ -> 0,10,20,
    # 1020(copy of 20? no: copies are 1000+i for i%3==0 -> 1000,1020...)
    # cluster propagation: copy 1000 shares text with doc 0 (opted out)
    # -> both purge; doc 20's clean copy 1020 purges via 1020's own flag.
    purge = {r2["doc_id"] for r2 in
             spark.read.parquet(out + "/purge_manifest").collect()}
    assert 0 in purge and 1000 in purge          # flag on 0 purges copy
    assert summary["n_clean"] + summary["n_purged"] == 40
    # doc 7 purged for contamination only, not opt-out.
    reasons = {r2["doc_id"]: list(r2["reasons"]) for r2 in
               spark.read.parquet(out + "/purge_manifest").collect()}
    assert reasons[7] == ["contamination"]


def test_governance_job_clean_pass(tmp_path, gov_corpus):
    out = str(tmp_path / "gov2")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "governance_job.py"),
         "--input", gov_corpus, "--output", out,
         "--k", "2", "--quasi", "lang", "--master", "local[4]"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert r.returncode == 0, r.stderr[-1500:]
    assert summary["k_anonymity"]["n_rows_at_risk"] == 0
    assert summary["n_optout_purged"] == 0
    assert summary["n_purged"] == summary["n_contaminated"] == 1


def test_web_hygiene_job_gates_and_shards(tmp_path, spark):
    """web_hygiene_job: PLD assignment + robots gate + canonical
    resolution + LPT shard plan in one spark-submit pass."""
    from pyspark.sql import Row

    pages = [
        # a 2-hop chain on example.co.uk, indexable
        Row(url="u1", host="www.example.co.uk", robots=None,
            canonical="u2"),
        Row(url="u2", host="www.example.co.uk", robots="index, follow",
            canonical="u3"),
        Row(url="u3", host="www.example.co.uk", robots=None,
            canonical=None),
        # a noindex page on a github.io site
        Row(url="u4", host="alice.github.io", robots="noindex, nofollow",
            canonical=None),
        # a canonical cycle pair
        Row(url="u5", host="b.example.com", robots=None, canonical="u6"),
        Row(url="u6", host="b.example.com", robots=None, canonical="u5"),
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(pages).write.parquet(src)
    wh = str(tmp_path / "wh")
    summary = run_job(
        "web_hygiene_job.py",
        "--pages", src,
        "--warehouse", wh,
        "--shards", "2",
        "--master", "local[4]",
    )
    assert summary["n_pages"] == 6
    assert summary["n_noindex"] == 1
    assert summary["n_indexable"] == 5
    assert summary["n_canonical_cycles"] == 2
    assert summary["n_plds"] == 3

    h = {r["url"]: r for r in spark.read.parquet(wh + "/page_hygiene").collect()}
    assert h["u1"]["registrable_domain"] == "example.co.uk"
    assert h["u4"]["registrable_domain"] == "alice.github.io"
    assert (h["u1"]["canonical_url"], h["u1"]["canonical_depth"]) == ("u3", 2)
    assert h["u5"]["canonical_status"] == "cycle"
    assert h["u4"]["indexable"] is False

    shards = {r["registrable_domain"]: r for r in
              spark.read.parquet(wh + "/pld_shards").collect()}
    # PSL folds b.example.com under example.com; LPT order 3,2,1
    assert h["u5"]["registrable_domain"] == "example.com"
    assert shards["example.co.uk"]["shard"] == 0
    assert shards["example.co.uk"]["size"] == 3
    assert shards["example.com"]["shard"] == 1
    # the noindex page's PLD carries no indexable mass: not sharded
    assert "alice.github.io" not in shards
    assert summary["max_shard_load"] == 3


@pytest.fixture(scope="module")
def code_corpus(tmp_path_factory, spark):
    """Files fixture for code_prep_job: licenses x quality x dups."""
    from pyspark.sql import Row

    mit = "// SPDX-License-Identifier: MIT\n"
    gpl = "// SPDX-License-Identifier: GPL-3.0\n"
    body = "def f(x):\n    return x + 1\n" * 3
    rows = [
        Row(doc_id=1, path="a.py", content=mit + body),            # kept
        Row(doc_id=2, path="b.py", content=gpl + body),            # license
        Row(doc_id=3, path="c.py", content=body),                  # no license
        Row(doc_id=4, path="d.py",                                 # quality
            content=mit + "// auto-generated do not edit\n" + body),
        Row(doc_id=5, path="e.py", content=mit + body),            # dup of 1
        Row(doc_id=6, path="f.py", content=mit + "x = 2\n"),       # kept
    ]
    p = str(tmp_path_factory.mktemp("codeprep") / "files.parquet")
    spark.createDataFrame(rows).write.parquet(p)
    return p


def test_code_prep_job_pipeline(tmp_path, spark, code_corpus):
    out = str(tmp_path / "cp")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "code_prep_job.py"),
         "--input", code_corpus, "--output", out,
         "--fim-pct", "100", "--spm-pct", "0", "--master", "local[4]"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    # licenses: 1, 4, 5, 6 are MIT (2 GPL-blocked, 3 unlicensed)
    assert summary["n_files"] == 6
    assert summary["n_license_ok"] == 4
    # quality: 4 is autogenerated
    assert summary["n_quality_ok"] == 3
    # dedup: 5 duplicates 1
    assert summary["n_after_dedup"] == 2
    assert summary["n_samples"] == 2
    assert summary["n_fim_samples"] == 2   # fim-pct 100
    manifest = {m["doc_id"]: m for m in
                spark.read.parquet(out + "/gate_manifest").collect()}
    assert manifest[1]["kept"] and manifest[6]["kept"]
    assert not manifest[5]["kept"]                      # dup loser
    assert manifest[2]["gate_reason"] == "license_blocked"
    assert manifest[2]["family"] == "copyleft"
    assert manifest[4]["gate_reason"] == "autogenerated"
    samples = {s["doc_id"]: s for s in
               spark.read.parquet(out + "/samples").collect()}
    assert set(samples) == {1, 6}
    assert all(s["mode"] == "psm" for s in samples.values())


def test_code_prep_job_allow_license_override(tmp_path, code_corpus):
    out = str(tmp_path / "cp2")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "code_prep_job.py"),
         "--input", code_corpus, "--output", out,
         "--allow-families", "permissive,copyleft",
         "--master", "local[4]"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    # GPL now admitted; only the unlicensed doc 3 is blocked
    assert summary["n_license_ok"] == 5
