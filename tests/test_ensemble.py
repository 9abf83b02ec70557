"""Ensemble content-extraction vote (ops/ensemble.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.ensemble import ensemble_vote


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(blk=i, a=a, b=b, c=c) for i, (a, b, c) in enumerate(rows)]
    )


def test_majority_vote_default_threshold(spark):
    out = {
        r["blk"]: r
        for r in ensemble_vote(
            _df(spark, [(1, 1, 1), (1, 1, 0), (1, 0, 0), (0, 0, 0)]),
            ("a", "b", "c"),
        ).collect()
    }
    assert [out[i]["votes"] for i in range(4)] == [3, 2, 1, 0]
    assert [out[i]["is_content"] for i in range(4)] == [1, 1, 0, 0]


def test_custom_threshold_unanimous(spark):
    out = ensemble_vote(
        _df(spark, [(1, 1, 1), (1, 1, 0)]), ("a", "b", "c"), threshold=3
    ).collect()
    assert [r["is_content"] for r in sorted(out, key=lambda r: r["blk"])] == [
        1,
        0,
    ]


def test_empty_cols_raise(spark):
    with pytest.raises(ValueError):
        ensemble_vote(_df(spark, [(1, 1, 1)]), ())


def test_registry_query_arms_disagree(spark):
    import __spark_entry__ as e

    df = e.queries()["ensemble_extract"](spark, "/root/testdata/sf0.001")
    assert df.columns == [
        "doc_id", "par_no", "v_justext", "v_boilerpipe", "v_cetr",
        "votes", "is_content",
    ]
    rows = df.collect()
    assert rows
    # the fixture must exercise real disagreement (the point of the
    # ensemble): some blocks pass one arm and fail another
    assert any(r["votes"] in (1, 2) for r in rows)
    assert any(r["is_content"] == 1 for r in rows)
    assert any(r["is_content"] == 0 for r in rows)
