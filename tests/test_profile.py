"""numeric_profile: hand-computed stats, null accounting, single-pass plan
(one aggregate, no per-column rescans)."""

import pytest

from reader_spark.ops.profile import numeric_profile

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (3.0, 30.0), (4.0, None), (100.0, 10.0)],
        "a double, b double",
    )


def test_stats_hand_checked(frame):
    got = {r["col_name"]: r.asDict() for r in numeric_profile(frame, ["a", "b"]).collect()}
    a = got["a"]
    assert (a["n"], a["n_null"], a["n_distinct"]) == (5.0, 0.0, 5.0)
    assert (a["min"], a["max"], a["p50"]) == (1.0, 100.0, 3.0)
    assert a["mean"] == 22.0
    b = got["b"]
    assert (b["n"], b["n_null"], b["n_distinct"]) == (5.0, 2.0, 2.0)
    assert b["p50"] == 10.0  # nulls excluded from the percentile


def test_rejects_empty_cols(frame):
    with pytest.raises(ValueError):
        numeric_profile(frame, [])


def test_single_scan_plan(frame):
    """k columns must NOT mean k scans: one aggregate pass, then stack."""
    from tests.test_plans import plan_of

    plan = plan_of(numeric_profile(frame, ["a", "b"]))
    section = plan.split("\n\n")[0]  # tree section of the formatted plan
    assert section.count("Scan") == 1
    assert "Generate" in plan or "stack" in plan.lower()
