"""Deequ-style data-quality checks (reader_spark.ops.checks)."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.checks import (
    check_accepted_values,
    check_completeness,
    check_in_range,
    check_referential,
    check_uniqueness,
    quality_report,
)


class TestChecks:
    def test_completeness(self, spark):
        df = spark.createDataFrame(
            [Row(v="a"), Row(v=None), Row(v="b"), Row(v="c")], schema="v string"
        )
        r = check_completeness(df, "v", threshold=0.7).head()
        assert (r.metric, r.passed) == (0.75, 1)
        assert check_completeness(df, "v", threshold=0.8).head().passed == 0

    def test_uniqueness_is_strict(self, spark):
        # Deequ semantics: 'a' appears twice -> BOTH occurrences non-unique
        df = spark.createDataFrame([Row(v="a"), Row(v="a"), Row(v="b"), Row(v=None)])
        r = check_uniqueness(df, "v").head()
        assert r.metric == pytest.approx(1 / 3, abs=1e-6)
        assert r.passed == 0

    def test_referential(self, spark):
        child = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=9)])
        parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
        r = check_referential(child, "k", parent, "pk", threshold=0.9).head()
        assert r.metric == pytest.approx(2 / 3, abs=1e-6)
        assert r.passed == 0

    def test_accepted_and_range(self, spark):
        df = spark.createDataFrame([Row(f="A", v=5.0), Row(f="X", v=500.0)])
        a = check_accepted_values(df, "f", ["A", "N", "R"], threshold=0.5).head()
        assert (a.metric, a.passed) == (0.5, 1)
        b = check_in_range(df, "v", 0.0, 100.0).head()
        assert (b.metric, b.passed) == (0.5, 0)

    def test_report_union_and_empty_suite(self, spark):
        df = spark.createDataFrame([Row(v="a")])
        rep = quality_report(
            [check_completeness(df, "v"), check_uniqueness(df, "v")]
        )
        assert rep.count() == 2
        assert set(rep.columns) == {"check_name", "metric", "passed"}
        with pytest.raises(ValueError, match="at least one"):
            quality_report([])

    def test_empty_table_yields_null_metric_not_error(self, spark):
        df = spark.createDataFrame([], schema="v string")
        r = check_completeness(df, "v").head()
        assert r.metric is None
