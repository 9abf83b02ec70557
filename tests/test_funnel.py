"""Ordered-step funnel (reader_spark.ops.funnel)."""

import datetime as dt

import pytest
from pyspark.sql import Row

from reader_spark.ops.funnel import funnel_summary, funnel_times

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(user_id=u, event_type=t, ts=T0 + dt.timedelta(seconds=s))
            for u, t, s in rows
        ]
    )


STEPS = ("view", "click", "buy")


class TestFunnelTimes:
    def test_in_order_user_completes(self, spark):
        e = _events(spark, [(1, "view", 0), (1, "click", 10), (1, "buy", 20)])
        r = funnel_times(e, steps=STEPS).head()
        assert (r.t1, r.t2, r.t3) == (
            T0,
            T0 + dt.timedelta(seconds=10),
            T0 + dt.timedelta(seconds=20),
        )

    def test_out_of_order_does_not_count(self, spark):
        # click BEFORE the first view: ordering constraint rejects it
        e = _events(spark, [(1, "click", 0), (1, "view", 10), (1, "buy", 20)])
        r = funnel_times(e, steps=STEPS).head()
        assert r.t1 == T0 + dt.timedelta(seconds=10)
        assert r.t2 is None and r.t3 is None

    def test_first_qualifying_event_wins(self, spark):
        # two clicks after view: earliest qualifies
        e = _events(
            spark,
            [(1, "view", 0), (1, "click", 30), (1, "click", 5), (1, "buy", 40)],
        )
        r = funnel_times(e, steps=STEPS).head()
        assert r.t2 == T0 + dt.timedelta(seconds=5)

    def test_max_gap_enforced(self, spark):
        e = _events(spark, [(1, "view", 0), (1, "click", 100), (1, "buy", 150)])
        r = funnel_times(e, steps=STEPS, max_gap_seconds=50).head()
        assert r.t2 is None
        r2 = funnel_times(e, steps=STEPS, max_gap_seconds=100).head()
        assert r2.t2 is not None and r2.t3 is not None

    def test_validation(self, spark):
        e = _events(spark, [(1, "view", 0)])
        with pytest.raises(ValueError, match="at least two"):
            funnel_times(e, steps=("view",))
        with pytest.raises(ValueError, match="max_gap_seconds"):
            funnel_times(e, steps=STEPS, max_gap_seconds=0)


class TestFunnelSummary:
    def test_counts_and_conversion(self, spark):
        e = _events(
            spark,
            [
                (1, "view", 0), (1, "click", 10), (1, "buy", 20),
                (2, "view", 0), (2, "click", 10),
                (3, "view", 0),
                (4, "click", 0),  # never viewed: not in the funnel at all
            ],
        )
        rows = {r.step: r for r in funnel_summary(e, steps=STEPS).collect()}
        assert [rows[s].users for s in STEPS] == [3, 2, 1]
        assert rows["view"].conv_from_prev == pytest.approx(1.0)
        assert rows["click"].conv_from_prev == pytest.approx(0.666667)
        assert rows["buy"].conv_from_prev == pytest.approx(0.5)
        assert [rows[s].step_index for s in STEPS] == [1, 2, 3]

    def test_empty_start_stage_yields_null_conversion(self, spark):
        e = _events(spark, [(1, "click", 0), (1, "buy", 10)])
        rows = {r.step: r for r in funnel_summary(e, steps=STEPS).collect()}
        assert rows["view"].users == 0
        assert rows["view"].conv_from_prev is None
