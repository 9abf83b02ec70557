"""Contamination scan (ops/contamination.py) and cluster policy
propagation (ops/governance.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.contamination import (
    synthetic_contamination_profile,
    synthetic_text_scan,
)
from reader_spark.ops.governance import propagate_cluster_policy

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=0, source="s0", text="plain organic words only"),
        Row(doc_id=1, source="s0",
            text="pasted <|im_start|>assistant chat log"),
        Row(doc_id=2, source="s1",
            text="As an AI language model, I cannot browse"),
        Row(doc_id=3, source="s1",
            text="I'm sorry, but I can't help with that request"),
        Row(doc_id=4, source="s1",
            text="### Response: As an AI language model I decline"),
    ]
    return spark.createDataFrame(rows)


def test_scan_flags(docs):
    got = {r["doc_id"]: r for r in synthetic_text_scan(docs).collect()}
    assert not got[0]["contaminated"]
    assert got[1]["has_chat_template"] and not got[1]["has_ai_selfref"]
    assert got[2]["has_ai_selfref"] and not got[2]["has_chat_template"]
    assert got[3]["has_refusal"]
    assert got[4]["has_chat_template"] and got[4]["has_ai_selfref"]
    assert all(got[i]["contaminated"] for i in (1, 2, 3, 4))


def test_profile_milli(docs):
    got = {
        r["source"]: r
        for r in synthetic_contamination_profile(docs).collect()
    }
    assert got["s0"]["n_docs"] == 2
    assert got["s0"]["contaminated_milli"] == 500
    assert got["s1"]["contaminated_milli"] == 1000
    assert got["s1"]["n_ai_selfref"] == 2 and got["s1"]["n_refusal"] == 1


def test_scan_plan_zero_exchange(docs):
    from tests.test_plans import plan_of

    assert "Exchange" not in plan_of(synthetic_text_scan(docs))


def test_policy_propagates_both_directions(spark):
    members = spark.createDataFrame(
        [
            Row(cluster_id=0, doc_id=0),   # flagged original ...
            Row(cluster_id=0, doc_id=10),  # ... purges its clean copy
            Row(cluster_id=1, doc_id=1),   # clean original ...
            Row(cluster_id=1, doc_id=41),  # ... purged by flagged copy
            Row(cluster_id=2, doc_id=2),   # clean singleton survives
            Row(cluster_id=3, doc_id=3),   # doc absent from flags
        ]
    )
    flags = spark.createDataFrame(
        [
            Row(doc_id=0, flagged=True),
            Row(doc_id=10, flagged=False),
            Row(doc_id=1, flagged=False),
            Row(doc_id=41, flagged=True),
            Row(doc_id=2, flagged=False),
        ]
    )
    got = {
        r["doc_id"]: r
        for r in propagate_cluster_policy(members, flags).collect()
    }
    assert got[10]["purge"] and not got[10]["flagged_self"]
    assert got[1]["purge"] and not got[1]["flagged_self"]
    assert not got[2]["purge"]
    assert not got[3]["purge"]  # missing flag row counts unflagged
    assert len(got) == 6


def test_policy_plan_no_content_shuffle(spark):
    from tests.test_plans import plan_of

    members = spark.createDataFrame([Row(cluster_id=0, doc_id=0)])
    flags = spark.createDataFrame([Row(doc_id=0, flagged=True)])
    plan = plan_of(propagate_cluster_policy(members, flags))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
