"""Input-hygiene audits (ops/audits.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.audits import embedding_quality_audit, lang_mismatch_audit

pytestmark = pytest.mark.spark


def test_embedding_audit_hand_values(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),            # norm2 = 1e12
        Row(vec_id=1, embedding=[0.0, 0.0]),            # zero vector
        Row(vec_id=2, embedding=None),                  # null
        Row(vec_id=3, embedding=[float("nan"), 1.0]),   # nan
        Row(vec_id=4, embedding=[1.0, 1.0, 1.0]),       # wrong dim
        Row(vec_id=5, embedding=[0.5, 0.5]),            # norm2 = 5e11
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    r = embedding_quality_audit(df, expected_dim=2).collect()[0]
    assert r["n_vectors"] == 6
    assert r["n_null_vec"] == 1
    assert r["n_nan_vec"] == 1
    assert r["n_zero_vec"] == 1
    assert r["n_dim_bad"] == 1
    # healthy norms: 1e12, 0, 5e11 (kilo: //1024).
    assert r["min_norm2_kilo"] == 0
    assert r["max_norm2_kilo"] == 10**12 // 1024
    assert r["mean_norm2_kilo"] == (10**12 // 1024 + 0 + 5 * 10**11 // 1024) // 3


def test_embedding_audit_plan_single_scalar_agg(spark):
    from tests.test_plans import plan_of

    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0])], "vec_id long, embedding array<double>"
    )
    plan = plan_of(embedding_quality_audit(df, expected_dim=1))
    # one scalar aggregate; no joins, no windows.
    assert "Join" not in plan and "Window" not in plan


def test_lang_mismatch_audit(spark):
    rows = [
        # declared en, detected en (the/a/table are en stopwords)
        Row(doc_id=0, source="s0", lang="en", text="the table has a value"),
        # declared zh, detected en -> mismatch
        Row(doc_id=1, source="s0", lang="zh", text="the table has a value"),
        # no stopword evidence -> undetected, NOT a mismatch
        Row(doc_id=2, source="s1", lang="en", text="zzz qqq www"),
    ]
    df = spark.createDataFrame(rows)
    got = {r["source"]: r for r in lang_mismatch_audit(df).collect()}
    assert got["s0"]["n_mismatch"] == 1
    assert got["s0"]["mismatch_milli"] == 500
    assert got["s1"]["n_mismatch"] == 0
    assert got["s1"]["n_undetected"] == 1


def test_pack_leakage_audit_hand_case(spark):
    from reader_spark.ops.packing import pack_leakage_audit

    # seq 0: docs a(flagged)+b -> mixed; seq 1: doc c alone flagged ->
    # fully flagged, NOT mixed; seq 2: clean.
    segs = spark.createDataFrame(
        [
            Row(doc_id="a", seq_id=0, doc_offset=0, seq_offset=0, n_tokens=300),
            Row(doc_id="b", seq_id=0, doc_offset=0, seq_offset=300, n_tokens=212),
            Row(doc_id="c", seq_id=1, doc_offset=0, seq_offset=0, n_tokens=512),
            Row(doc_id="d", seq_id=2, doc_offset=0, seq_offset=0, n_tokens=100),
        ]
    )
    flags = spark.createDataFrame(
        [Row(doc_id="a", flagged=True), Row(doc_id="c", flagged=True),
         Row(doc_id="b", flagged=False)]  # d absent -> unflagged
    )
    got = {r["seq_id"]: r for r in pack_leakage_audit(segs, flags).collect()}
    assert got[0]["mixed"] and got[0]["flagged_tokens"] == 300
    assert got[0]["n_flagged_docs"] == 1 and got[0]["n_docs"] == 2
    assert not got[1]["mixed"] and got[1]["n_flagged_docs"] == 1
    assert not got[2]["mixed"] and got[2]["flagged_tokens"] == 0
