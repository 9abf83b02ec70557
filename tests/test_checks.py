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


def test_fk_audit_detects_planted_orphans(spark, tmp_path):
    """The fk_audit driver query reports 0 orphans on the consistent
    warehouse; this pins that the same anti-join construction DOES count
    violations when they exist (audit has detection power, the zeros are
    earned)."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    clean = {r["fk"]: r["n_orphans"] for r in e.queries()["fk_audit"](spark, sf).collect()}
    assert set(clean.values()) == {0}

    # corrupt a copy: point 5 orders at nonexistent customers
    d = str(tmp_path / "sfbad")
    import os, shutil
    os.makedirs(d)
    for t in ("orders", "customer", "lineitem", "part"):
        shutil.copytree(f"{sf}/{t}.parquet", f"{d}/{t}.parquet") if os.path.isdir(
            f"{sf}/{t}.parquet"
        ) else shutil.copy(f"{sf}/{t}.parquet", f"{d}/{t}.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    bad = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 300 == 0, F.lit(10_000_000)).otherwise(
            F.col("o_custkey")
        ),
    )
    import os as _os
    _os.remove(f"{d}/orders.parquet") if _os.path.isfile(f"{d}/orders.parquet") else shutil.rmtree(f"{d}/orders.parquet")
    bad.write.parquet(f"{d}/orders.parquet")
    dirty = {r["fk"]: r["n_orphans"] for r in e.queries()["fk_audit"](spark, d).collect()}
    assert dirty["orders.custkey"] > 0
    assert dirty["lineitem.partkey"] == 0  # untouched FK stays clean
