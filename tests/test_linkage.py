"""Fellegi-Sunter record linkage (ops/linkage.py, Fellegi & Sunter
1969; Newcombe blocking)."""

import math

import pytest
from pyspark.sql import Row

from reader_spark.ops.linkage import (
    DEFAULT_PARAMS,
    fs_link_pairs,
    fs_linkage_profile,
    fs_weights,
)


def _pairs(spark, a_rows, b_rows, **kw):
    a = spark.createDataFrame([Row(**r) for r in a_rows])
    b = spark.createDataFrame([Row(**r) for r in b_rows])
    return fs_link_pairs(a, b, **kw).collect()


def _rec(rid, name="alpha", host="h1", len_bucket=2, block="a-2"):
    return {
        "rid": rid,
        "name": name,
        "host": host,
        "len_bucket": len_bucket,
        "block": block,
    }


def test_weights_match_closed_form():
    w = fs_weights(DEFAULT_PARAMS)
    assert w["name"] == (
        round(math.log2(950 / 10) * 1000),
        round(math.log2(50 / 990) * 1000),
    )
    # agreement evidence positive, disagreement negative, always
    for wa, wd in w.values():
        assert wa > 0 > wd


def test_full_agreement_links_and_gamma_reads_in_field_order(spark):
    rows = _pairs(spark, [_rec("a1")], [_rec("b1")])
    assert len(rows) == 1
    r = rows[0]
    w = fs_weights(DEFAULT_PARAMS)
    want = sum(wa for wa, _ in w.values())
    assert (r["gamma"], r["score_milli"], r["decision"]) == (
        "111",
        want,
        "link",
    )


def test_single_field_drift_goes_to_clerical_review(spark):
    rows = _pairs(spark, [_rec("a1")], [_rec("b1", host="h2")])
    w = fs_weights(DEFAULT_PARAMS)
    want = w["name"][0] + w["host"][1] + w["len_bucket"][0]
    assert [(r["gamma"], r["score_milli"], r["decision"]) for r in rows] == [
        ("101", want, "possible")
    ]


def test_total_disagreement_is_non_link(spark):
    rows = _pairs(
        spark, [_rec("a1")], [_rec("b1", name="zeta", host="h9", len_bucket=7)]
    )
    assert rows[0]["gamma"] == "000"
    assert rows[0]["decision"] == "non_link"


def test_null_fields_compare_as_disagreement_unless_both_null(spark):
    schema = (
        "rid string, name string, host string, len_bucket bigint, "
        "block string"
    )

    def _mk(rows):
        return spark.createDataFrame(
            [
                (r["rid"], r["name"], r["host"], r["len_bucket"], r["block"])
                for r in rows
            ],
            schema,
        )

    rows = fs_link_pairs(
        _mk([_rec("a1", name=None)]), _mk([_rec("b1")])
    ).collect()
    assert rows[0]["gamma"] == "011"
    rows = fs_link_pairs(
        _mk([_rec("a1", name=None)]), _mk([_rec("b1", name=None)])
    ).collect()
    assert rows[0]["gamma"] == "111"  # NULL-safe equality: both missing


def test_blocking_is_a_hard_gate(spark):
    rows = _pairs(
        spark, [_rec("a1", block="a-2")], [_rec("b1", block="z-2")]
    )
    assert rows == []


def test_param_validation():
    with pytest.raises(ValueError):
        fs_weights({"f": (10, 950)})  # u >= m
    with pytest.raises(ValueError):
        fs_weights({"f": (1000, 10)})  # m out of range


def test_profile_is_uniform_per_pattern(spark):
    a = [_rec("a1"), _rec("a2", name="beta", block="b-2")]
    b = [_rec("b1"), _rec("b2", name="beta", block="b-2")]
    adf = spark.createDataFrame([Row(**r) for r in a])
    bdf = spark.createDataFrame([Row(**r) for r in b])
    prof = fs_linkage_profile(fs_link_pairs(adf, bdf)).collect()
    assert all(r["uniform"] for r in prof)
    assert sum(r["n_pairs"] for r in prof) == 2


def test_registry_and_oracle(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["fs_linkage_pairs"](
        spark, "/root/testdata/sf0.001"
    )
    assert df.columns == [
        "rid_a",
        "rid_b",
        "gamma",
        "score_milli",
        "decision",
    ]
    o = entrymod.oracle_sql()
    for k in ("fs_linkage_pairs", "fs_linkage_profile", "fs_linkage_eval"):
        assert k in o
