"""Property-based equivalence: asof_join and range_join_buckets must match
a brute-force Python reference on arbitrary small inputs (random keys,
times, ties, tolerances, bucket widths)."""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from reader_spark.ops.joins import asof_join, range_join_buckets

pytestmark = pytest.mark.spark

BASE = datetime(2024, 1, 1)


def ts(seconds):
    return BASE + timedelta(seconds=seconds)


keys = st.sampled_from(["a", "b", "c"])
secs = st.integers(min_value=0, max_value=120)

left_rows = st.lists(
    st.tuples(keys, secs), min_size=1, max_size=15, unique=True
)
right_rows = st.lists(
    st.tuples(keys, secs), min_size=0, max_size=15, unique=True
)


@given(left=left_rows, right=right_rows,
       tol=st.sampled_from([None, 0, 10, 1000]))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_backward_matches_bruteforce(spark, left, right, tol):
    ldf = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(left)],
        "k string, lt timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(right)],
        "k string, rt timestamp, rid long",
    )
    got = {
        r["lid"]: r["matched_rid"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="lt", right_time="rt",
            value_cols=["rid"], tiebreak="rid", tolerance_seconds=tol,
        ).collect()
    }

    want = {}
    for i, (k, t) in enumerate(left):
        cands = [
            (rt, j) for j, (rk, rt) in enumerate(right)
            if rk == k and rt <= t and (tol is None or t - rt <= tol)
        ]
        want[i] = max(cands)[1] if cands else None
    assert got == want


@given(points=left_rows, intervals=right_rows,
       length=st.integers(min_value=1, max_value=40),
       bucket=st.sampled_from([1, 7, 50, 3600]))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_range_join_matches_bruteforce(spark, points, intervals, length, bucket):
    pdf = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(points)],
        "k string, pt timestamp, pid long",
    )
    idf = spark.createDataFrame(
        [(k, ts(t), ts(t + length), i) for i, (k, t) in enumerate(intervals)],
        "k string, start timestamp, end timestamp, iid long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join_buckets(
            pdf, idf, on=["k"], point_time="pt",
            interval_start="start", interval_end="end",
            bucket_seconds=bucket,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (pk, pt) in enumerate(points)
        for j, (ik, it) in enumerate(intervals)
        if pk == ik and it <= pt < it + length
    )
    assert got == want
