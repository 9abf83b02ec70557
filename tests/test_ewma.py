"""Per-group EWMA via applyInPandas (reader_spark.ops.ewma)."""

import datetime as dt

import pytest
from pyspark.sql import Row

from reader_spark.ops.ewma import grouped_ewma

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            Row(g=g, rid=i, ts=T0 + dt.timedelta(seconds=s), v=float(v))
            for i, (g, s, v) in enumerate(rows)
        ]
    )


class TestGroupedEwma:
    def test_hand_computed_recurrence(self, spark):
        # alpha=0.5: y = [10, 5+? ...] -> 10, 0.5*0+0.5*10=5, 0.5*20+0.5*5=12.5
        df = _df(spark, [("a", 0, 10), ("a", 1, 0), ("a", 2, 20)])
        got = [
            r.ewma
            for r in grouped_ewma(df, ["g"], ["ts", "rid"], "v", alpha=0.5)
            .orderBy("ts")
            .collect()
        ]
        assert got == [10.0, 5.0, 12.5]

    def test_alpha_one_is_identity(self, spark):
        df = _df(spark, [("a", 0, 3), ("a", 1, 7), ("a", 2, 1)])
        got = [
            (r.v, r.ewma)
            for r in grouped_ewma(df, ["g"], ["ts", "rid"], "v", alpha=1.0)
            .orderBy("ts")
            .collect()
        ]
        assert all(v == e for v, e in got)

    def test_groups_independent(self, spark):
        df = _df(spark, [("a", 0, 100), ("b", 1, 0), ("b", 2, 0)])
        got = {r.g: r.ewma for r in grouped_ewma(
            df, ["g"], ["ts", "rid"], "v", alpha=0.5
        ).where("ts >= timestamp '2024-01-01 00:00:01'").collect()}
        # group b never sees group a's 100
        assert got["b"] == 0.0

    def test_partition_invariant(self, spark):
        df = _df(
            spark,
            [("g%d" % (i % 3), i, (i * 17) % 23) for i in range(300)],
        )
        a = sorted(map(tuple, grouped_ewma(df.coalesce(1), ["g"], ["ts", "rid"], "v", 0.2).collect()))
        b = sorted(map(tuple, grouped_ewma(df.repartition(13), ["g"], ["ts", "rid"], "v", 0.2).collect()))
        assert a == b

    def test_validation(self, spark):
        df = _df(spark, [("a", 0, 1)])
        with pytest.raises(ValueError, match="alpha"):
            grouped_ewma(df, ["g"], ["ts"], "v", alpha=0.0)
        with pytest.raises(ValueError, match="group_cols"):
            grouped_ewma(df, [], ["ts"], "v", alpha=0.5)
