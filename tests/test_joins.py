"""As-of join and bucketed range join: semantics on hand-built frames,
equivalence to the naive theta-join form, and the plan shapes that make
them 100 TB-safe (no nested-loop/cartesian fallback)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from reader_spark.ops.joins import asof_join, range_join_buckets

pytestmark = pytest.mark.spark


def ts(minute, second=0, micro=0):
    return datetime(2024, 1, 1, 12, minute, second, micro)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", ts(0), 1, 10.0),
            ("A", ts(5), 2, 11.0),
            ("A", ts(5), 3, 12.0),  # tie on time with id 2
            ("A", ts(20), 4, 13.0),
            ("B", ts(1), 5, 50.0),
        ],
        "sym string, qt timestamp, qid long, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", ts(5), 100),   # equal-time: must match a ts(5) quote
            ("A", ts(7), 101),   # between: latest prior is ts(5)
            ("A", ts(19), 102),  # gap: prior quote 14 min old
            ("B", ts(0), 103),   # before any quote: no match
            ("C", ts(9), 104),   # key with no quotes at all
        ],
        "sym string, tt timestamp, tid long",
    )
    return quotes, trades


def test_asof_backward_semantics(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_time="tt", right_time="qt",
        value_cols=["qid", "px"], tiebreak="qid",
    )
    got = {r["tid"]: (r["matched_qid"], r["matched_px"]) for r in out.collect()}
    assert got[100] == (3, 12.0)  # inclusive <=, tie -> max tiebreak
    assert got[101] == (3, 12.0)
    assert got[102] == (3, 12.0)
    assert got[103] == (None, None)
    assert got[104] == (None, None)
    assert out.count() == 5  # left-outer: every trade survives


def test_asof_backward_tolerance(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_time="tt", right_time="qt",
        value_cols=["qid"], tiebreak="qid", tolerance_seconds=300,
    )
    got = {r["tid"]: r["matched_qid"] for r in out.collect()}
    assert got[100] == 3  # 0 s gap
    assert got[101] == 3  # 120 s gap
    assert got[102] is None  # 840 s gap > 300 s tolerance


def test_asof_forward_semantics(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_time="tt", right_time="qt",
        value_cols=["qid"], tiebreak="qid", direction="forward",
    )
    got = {r["tid"]: r["matched_qid"] for r in out.collect()}
    assert got[100] == 2  # inclusive >=, tie -> min tiebreak
    assert got[101] == 4  # next quote after ts(7)
    assert got[103] == 5  # B's first quote
    assert got[104] is None


def test_asof_values_come_from_one_row(spark):
    """A NULL value inside the matched right row must NOT fall back to an
    older row's value — the payload struct keeps the row atomic."""
    right = spark.createDataFrame(
        [("k", ts(0), 1, 7.0), ("k", ts(5), 2, None)],
        "k string, rt timestamp, rid long, v double",
    )
    left = spark.createDataFrame([("k", ts(9))], "k string, lt timestamp")
    row = asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt",
        value_cols=["rid", "v"], tiebreak="rid",
    ).collect()[0]
    assert row["matched_rid"] == 2 and row["matched_v"] is None


def test_asof_rejects_bad_args(quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on=["sym"], left_time="tt",
                  right_time="qt", value_cols=["qid"], direction="sideways")
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on=["sym"], left_time="tt",
                  right_time="qt", value_cols=[])


def test_asof_plan_one_shuffle_no_nested_loop(quotes_trades):
    from tests.test_plans import plan_of

    quotes, trades = quotes_trades
    plan = plan_of(asof_join(
        trades, quotes, on=["sym"], left_time="tt", right_time="qt",
        value_cols=["px"], tiebreak="qid",
    ))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    # union + window: exactly one exchange, keyed on the join key
    assert plan.count("+- Exchange") + plan.count("+- == Exchange") == 1 or (
        plan.count("Exchange (") == 1
    )
    assert "hashpartitioning(sym" in plan


@pytest.fixture(scope="module")
def points_intervals(spark):
    base = datetime(2024, 3, 1)
    points = spark.createDataFrame(
        [(i % 5, base + timedelta(minutes=7 * i), i) for i in range(200)],
        "k long, pt timestamp, pid long",
    )
    intervals = spark.createDataFrame(
        [
            (j % 5, base + timedelta(minutes=11 * j),
             base + timedelta(minutes=11 * j + 25 + (j % 3) * 40), j)
            for j in range(60)
        ],
        "k long, start timestamp, end timestamp, iid long",
    )
    return points, intervals


@pytest.mark.parametrize("bucket_seconds", [600, 3600, 86400])
def test_range_join_matches_naive(points_intervals, bucket_seconds):
    """Bucketed form == naive theta join, whether intervals span many
    buckets (600 s) or fractions of one (86400 s)."""
    points, intervals = points_intervals
    got = range_join_buckets(
        points, intervals, on=["k"], point_time="pt",
        interval_start="start", interval_end="end",
        bucket_seconds=bucket_seconds,
    ).select("pid", "iid")
    naive = points.join(
        intervals,
        (points.k == intervals.k)
        & (points.pt >= intervals.start)
        & (points.pt < intervals.end),
    ).select("pid", "iid")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    assert got.count() == got.distinct().count()  # no duplicate pairs


def test_range_join_end_exclusive(spark):
    iv = spark.createDataFrame(
        [(1, ts(0), ts(10), 1)], "k long, start timestamp, end timestamp, iid long"
    )
    pts = spark.createDataFrame(
        [(1, ts(0), 1), (1, ts(10), 2)], "k long, pt timestamp, pid long"
    )
    got = range_join_buckets(
        pts, iv, on=["k"], point_time="pt", interval_start="start",
        interval_end="end", bucket_seconds=60,
    ).select("pid").collect()
    assert [r["pid"] for r in got] == [1]  # start inclusive, end exclusive


def test_range_join_rejects_bad_bucket(points_intervals):
    points, intervals = points_intervals
    with pytest.raises(ValueError):
        range_join_buckets(points, intervals, on=["k"], point_time="pt",
                           interval_start="start", interval_end="end",
                           bucket_seconds=0)


def test_range_join_plan_equi_join(points_intervals):
    from tests.test_plans import plan_of

    points, intervals = points_intervals
    plan = plan_of(range_join_buckets(
        points, intervals, on=["k"], point_time="pt",
        interval_start="start", interval_end="end", bucket_seconds=3600,
    ))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the join itself must be hash/merge on (k, __bucket)
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)
