"""DataFrame-level end-to-end tests: fixture docs table -> extraction job ->
span equality, resume anti-join, skew salting, lineage sidecar."""

import pytest

from reader_spark import fixtures
from reader_spark.extract.pipeline import extract_document
from reader_spark.spark.io import Warehouse
from reader_spark.spark.job import (
    docs_from_rows,
    extract_dataframe,
    run_extraction,
    with_payload,
)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def fixture_rows():
    # Exclude the pdf doc (handled by the pdf module, not the HTML pipeline).
    return [d for d in fixtures.fixture_docs() if d["doc_id"] != "pdf-two-column"]


@pytest.fixture(scope="module")
def extracted_rows(spark, fixture_rows):
    docs = docs_from_rows(spark, fixture_rows)
    result = extract_dataframe(docs, num_partitions=4)
    return {row["doc_id"]: row for row in result.collect()}


def test_all_docs_produce_rows(extracted_rows, fixture_rows):
    assert set(extracted_rows) == {d["doc_id"] for d in fixture_rows}


def test_payload_reassembly_matches_python(spark, fixture_rows):
    docs = docs_from_rows(spark, fixture_rows)
    payloads = {r["doc_id"]: r["payload"] for r in with_payload(docs).collect()}
    for doc in fixture_rows:
        expected = "".join(
            s["text"] for s in sorted(doc["spans"], key=lambda s: s["offset"])
        )
        assert payloads[doc["doc_id"]] == expected


def test_span_equality_with_python_pipeline(extracted_rows, fixture_rows):
    """The Spark job must emit the identical span sequence as the pure-Python
    pipeline for every fixture doc — (kind, text, media_ref, order)."""
    for doc in fixture_rows:
        doc_id = doc["doc_id"]
        payload = "".join(
            s["text"] for s in sorted(doc["spans"], key=lambda s: s["offset"])
        )
        expected = extract_document(doc_id, payload, fixtures.base_url_for(doc_id))
        got = extracted_rows[doc_id]["spans"]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in got
        ] == [
            (s.kind, s.text, s.media_ref, i) for i, s in enumerate(expected.spans)
        ], f"span mismatch for {doc_id}"


def test_metadata_struct(extracted_rows):
    meta = extracted_rows["simple-static"]["metadata"]
    assert meta["title"] == "Simple Fixture Page"
    assert meta["language"] == "en"
    assert meta["openGraph"]["title"] == "Simple Fixture OG"
    assert meta["twitter"] is None


def test_json_short_circuit(extracted_rows):
    row = extracted_rows["json-payload"]
    assert [s["kind"] for s in row["spans"]] == ["json"]
    assert row["markdown"].startswith("```json")


def test_error_columns_not_exceptions(spark):
    docs = docs_from_rows(
        spark,
        [{"doc_id": "empty-doc", "spans": [{"kind": "html", "text": "   ", "media_ref": None, "offset": 0}]}],
    )
    rows = extract_dataframe(docs).collect()
    assert rows[0]["error_kind"] == "EmptyDocumentError"
    assert rows[0]["spans"] == []


def test_run_extraction_and_lineage(spark, fixture_rows, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "warehouse"))
    docs = docs_from_rows(spark, fixture_rows)
    metrics = run_extraction(spark, docs, wh, run_id="r1", num_partitions=4)
    assert metrics["totalDocs"] == len(fixture_rows)
    assert metrics["failedDocs"] == 0

    lineage = wh.read("lineage").collect()
    assert sum(r["doc_count"] for r in lineage) == len(fixture_rows)
    assert all(r["run_id"] == "r1" for r in lineage)
    assert sum(r["bytes_in"] for r in lineage) > 0


def test_checkpoint_resume(spark, fixture_rows, tmp_path):
    """Commit half, re-run over the full input: the anti-join must skip
    committed docs and the final table must equal a single-shot run."""
    wh = Warehouse(spark, str(tmp_path / "warehouse"))
    half = fixture_rows[: len(fixture_rows) // 2]
    run_extraction(spark, docs_from_rows(spark, half), wh, run_id="r1")

    metrics2 = run_extraction(
        spark, docs_from_rows(spark, fixture_rows), wh, run_id="r2"
    )
    # Second run only processed the un-committed half.
    assert metrics2["totalDocs"] == len(fixture_rows) - len(half)

    final = wh.read("extracted")
    assert final.count() == len(fixture_rows)
    assert final.select("doc_id").distinct().count() == len(fixture_rows)

    # Single-shot reference run — identical doc_id -> markdown mapping.
    wh_single = Warehouse(spark, str(tmp_path / "single"))
    run_extraction(spark, docs_from_rows(spark, fixture_rows), wh_single, run_id="s1")
    resumed = {r["doc_id"]: r["markdown"] for r in final.collect()}
    single = {r["doc_id"]: r["markdown"] for r in wh_single.read("extracted").collect()}
    assert resumed == single


def test_skew_isolation_preserves_output(spark):
    """One oversized doc among many small ones: the giant-isolation path must
    not change results, and every doc must still appear exactly once."""
    rows = list(fixtures.scaled_docs(50, seed=7, oversized_fraction=0.0))
    rows.append(
        {
            "doc_id": "giant",
            "spans": [
                {
                    "kind": "html",
                    "text": fixtures.make_oversized_html(512_000),
                    "media_ref": None,
                    "offset": 0,
                }
            ],
        }
    )
    docs = docs_from_rows(spark, rows)
    isolated = {
        r["doc_id"]: r["markdown"]
        for r in extract_dataframe(docs, num_partitions=8, skew_mode="isolate").collect()
    }
    plain = {
        r["doc_id"]: r["markdown"]
        for r in extract_dataframe(docs, num_partitions=8, skew_mode="scan").collect()
    }
    assert isolated == plain
    assert len(isolated) == 51
    assert "Oversized filler paragraph" in isolated["giant"]
