"""Cohort retention (reader_spark.ops.retention)."""

import datetime as dt

import pytest
from pyspark.sql import Row

from reader_spark.ops.retention import cohort_retention


def _activity(spark, rows):
    return spark.createDataFrame(
        [
            Row(user_id=u, ts=dt.datetime(2024, 1, 1) + dt.timedelta(days=d))
            for u, d in rows
        ]
    )


class TestCohortRetention:
    def test_matrix_values(self, spark):
        # cohort week 0: users 1,2 (user 1 returns weeks 1 and 2, user 2 never)
        # cohort week 1: user 3 (returns week 2 -> offset 1)
        e = _activity(
            spark,
            [(1, 0), (1, 8), (1, 15), (2, 2), (3, 7), (3, 16)],
        )
        cells = {
            (r.cohort_week, r.week_offset): r
            for r in cohort_retention(e).collect()
        }
        assert cells[(0, 0)].cohort_size == 2
        assert cells[(0, 0)].active_users == 2
        assert cells[(0, 0)].retention == pytest.approx(1.0)
        assert cells[(0, 1)].active_users == 1
        assert cells[(0, 1)].retention == pytest.approx(0.5)
        assert cells[(0, 2)].active_users == 1
        assert cells[(1, 0)].cohort_size == 1
        assert cells[(1, 1)].active_users == 1
        assert set(cells) == {(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)}

    def test_period_collapse_dedupes_bursts(self, spark):
        # 5 events in one week count once
        e = _activity(spark, [(1, 0), (1, 1), (1, 2), (1, 3), (1, 4)])
        rows = cohort_retention(e).collect()
        assert len(rows) == 1
        assert rows[0].active_users == 1

    def test_custom_period_days(self, spark):
        e = _activity(spark, [(1, 0), (1, 3)])
        # 2-day periods: day 3 falls in period 1 -> offset 1 cell exists
        cells = {
            (r.cohort_week, r.week_offset)
            for r in cohort_retention(e, period_days=2).collect()
        }
        assert (0, 1) in cells

    def test_validation(self, spark):
        e = _activity(spark, [(1, 0)])
        with pytest.raises(ValueError, match="period_days"):
            cohort_retention(e, period_days=0)
