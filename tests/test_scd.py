"""SCD2 version history (reader_spark.ops.scd)."""

import datetime as dt

import pytest
from pyspark.sql import Row

from reader_spark.ops.scd import scd2_history

T0 = dt.datetime(2024, 1, 1)


def _updates(spark, rows):
    return spark.createDataFrame(
        [
            Row(k=k, uid=i, ts=T0 + dt.timedelta(seconds=s), state=st)
            for i, (k, s, st) in enumerate(rows)
        ]
    )


class TestScd2History:
    def test_episodes_and_bounds(self, spark):
        u = _updates(
            spark,
            [("a", 0, "x"), ("a", 10, "x"), ("a", 20, "y"), ("a", 30, "x")],
        )
        rows = sorted(
            scd2_history(u, ["k"], "ts", ["state"], ["uid"]).collect(),
            key=lambda r: r.valid_from,
        )
        # x (0..20), y (20..30), x (30..) — the no-change update at t=10 collapses
        assert [(r.state, r.is_current) for r in rows] == [
            ("x", 0), ("y", 0), ("x", 1),
        ]
        assert rows[0].valid_to == rows[1].valid_from
        assert rows[1].valid_to == rows[2].valid_from
        assert rows[2].valid_to is None

    def test_keys_are_independent(self, spark):
        u = _updates(spark, [("a", 0, "x"), ("b", 5, "x"), ("b", 10, "y")])
        rows = scd2_history(u, ["k"], "ts", ["state"], ["uid"]).collect()
        currents = {(r.k, r.state) for r in rows if r.is_current == 1}
        assert currents == {("a", "x"), ("b", "y")}

    def test_same_timestamp_tiebreak_deterministic(self, spark):
        # two different states at the identical ts: uid pins which comes first
        u = _updates(spark, [("a", 0, "x"), ("a", 0, "y")])
        rows = sorted(
            scd2_history(u, ["k"], "ts", ["state"], ["uid"]).collect(),
            key=lambda r: (r.valid_to is None),
        )
        assert [r.state for r in rows] == ["x", "y"]
        assert rows[0].valid_to == rows[1].valid_from

    def test_validation(self, spark):
        u = _updates(spark, [("a", 0, "x")])
        with pytest.raises(ValueError, match="key_cols"):
            scd2_history(u, [], "ts", ["state"])
        with pytest.raises(ValueError, match="key_cols"):
            scd2_history(u, ["k"], "ts", [])
