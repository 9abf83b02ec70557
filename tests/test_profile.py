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


def test_exact_two_pass_plan(frame):
    """Exact mode is exactly TWO aggregate passes (r6 optimization):
    the percentile/base pass with NO Expand (percentile buffers must
    not be keyed by distinct values), plus the count-distinct pass over
    the Expand — never k scans for k columns."""
    from tests.test_plans import plan_of

    plan = plan_of(numeric_profile(frame, ["a", "b"]))
    section = plan.split("\n\n")[0]  # tree section of the formatted plan
    assert section.count("Scan") == 2
    assert "Generate" in plan or "stack" in plan.lower()
    # the percentile aggregate must sit directly on a scan, not on the
    # Expand: every Expand in the plan feeds only count-distinct work
    assert "percentile" in plan
    for op in plan.split("\n\n"):
        if op.startswith("(") and "percentile" in op and "Expand" in op:
            raise AssertionError("percentile keyed under Expand")


def test_approx_mode_no_sort_and_partial_agg(frame):
    """The production (exact=False) profile must be sketch-only: no Sort
    or Expand in the plan (exact percentile/countDistinct force them),
    and the aggregation must have a map-side partial."""
    from tests.test_plans import plan_of

    plan = plan_of(numeric_profile(frame, ["a", "b"], exact=False))
    section = plan.split("\n\n")[0]
    assert "Sort" not in section
    assert "Expand" not in section  # countDistinct's expand is gone too
    assert section.count("Scan") == 1  # approx stays single-pass
    assert "partial" in plan.lower()
    # the exact twin, by contrast, needs the distinct expand
    exact_plan = plan_of(numeric_profile(frame, ["a", "b"]))
    assert "Expand" in exact_plan.split("\n\n")[0]


def test_approx_within_documented_error_sf001(spark):
    """approx profile vs exact twin on real data: non-sketched stats are
    identical; p50 within 1% of exact; distinct within 5% (HLL++ rsd)."""
    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = {
        r["col_name"]: r.asDict()
        for r in numeric_profile(events, ["value", "user_id"]).collect()
    }
    approx = {
        r["col_name"]: r.asDict()
        for r in numeric_profile(
            events, ["value", "user_id"], exact=False
        ).collect()
    }
    for c in ("value", "user_id"):
        for m in ("n", "n_null", "min", "max", "mean", "stddev"):
            assert approx[c][m] == exact[c][m], (c, m)
        assert abs(approx[c]["p50"] - exact[c]["p50"]) <= 0.01 * max(
            1.0, abs(exact[c]["p50"])
        )
        assert abs(approx[c]["n_distinct"] - exact[c]["n_distinct"]) <= (
            0.05 * exact[c]["n_distinct"]
        )


class TestEquiWidthHistogram:
    def test_known_bins(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import equi_width_histogram

        df = spark.createDataFrame([Row(v=float(x)) for x in range(100)])
        rows = {r.bin: r for r in equi_width_histogram(df, "v", bins=10).collect()}
        # 0..99 over 10 bins: ~10 per bin; max value 99 lands in bin 9
        assert set(rows) == set(range(10))
        assert sum(r.n for r in rows.values()) == 100
        assert rows[9].n >= 1
        assert rows[0].lo == 0.0 and rows[9].hi == 99.0

    def test_max_value_in_last_bin_not_overflow(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import equi_width_histogram

        df = spark.createDataFrame([Row(v=0.0), Row(v=1.0)])
        rows = {r.bin: r.n for r in equi_width_histogram(df, "v", bins=4).collect()}
        assert rows == {0: 1, 3: 1}

    def test_constant_column_single_bin(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import equi_width_histogram

        df = spark.createDataFrame([Row(v=5.0)] * 7)
        rows = equi_width_histogram(df, "v", bins=10).collect()
        assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n == 7

    def test_nulls_excluded(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import equi_width_histogram

        df = spark.createDataFrame(
            [Row(v=1.0), Row(v=None), Row(v=2.0)],
            schema="v double",
        )
        assert (
            equi_width_histogram(df, "v", bins=2)
            .agg({"n": "sum"})
            .head()[0]
            == 2
        )

    def test_validation(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import equi_width_histogram

        import pytest as _pytest

        df = spark.createDataFrame([Row(v=1.0)])
        with _pytest.raises(ValueError, match="bins"):
            equi_width_histogram(df, "v", bins=0)


class TestGroupedLinreg:
    def test_perfect_line_recovered(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import grouped_linreg

        df = spark.createDataFrame(
            [Row(g="a", x=float(i), y=2.0 * i + 1.0) for i in range(20)]
        )
        r = grouped_linreg(df, ["g"], "x", "y").head()
        assert (r.n, r.slope, r.intercept, r.r2) == (20, 2.0, 1.0, 1.0)

    def test_groups_independent_and_negative_slope(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import grouped_linreg

        rows = [Row(g="up", x=float(i), y=3.0 * i) for i in range(10)]
        rows += [Row(g="down", x=float(i), y=-1.5 * i + 4.0) for i in range(10)]
        df = spark.createDataFrame(rows)
        got = {r.g: r for r in grouped_linreg(df, ["g"], "x", "y").collect()}
        assert got["up"].slope == 3.0
        assert got["down"].slope == -1.5
        assert got["down"].intercept == 4.0

    def test_constant_x_yields_null_not_error(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import grouped_linreg

        df = spark.createDataFrame([Row(g="c", x=5.0, y=float(i)) for i in range(5)])
        r = grouped_linreg(df, ["g"], "x", "y").head()
        assert r.slope is None and r.r2 is None

    def test_partition_invariant(self, spark):
        """Sufficient statistics are mergeable: result identical at any
        partitioning (the 6 dp rounding absorbs partial-sum order)."""
        from pyspark.sql import Row

        from reader_spark.ops.profile import grouped_linreg

        df = spark.createDataFrame(
            [Row(g="a", x=float(i % 37), y=(i * 7 % 13) + 0.25) for i in range(500)]
        )
        one = grouped_linreg(df.coalesce(1), ["g"], "x", "y").head()
        many = grouped_linreg(df.repartition(16), ["g"], "x", "y").head()
        assert tuple(one) == tuple(many)


class TestKeySkewProfile:
    def test_hot_key_surfaces(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import key_skew_profile

        rows = [Row(k="hot") for _ in range(80)]
        rows += [Row(k=f"cold{i}") for i in range(20)]
        df = spark.createDataFrame(rows)
        got = key_skew_profile(df, "k", top=3).collect()
        assert got[0].key == "hot" and got[0].rank == 1
        assert got[0].n == 80 and got[0].frac == 0.8
        # mean key count = 100/21; hot_factor = 80/(100/21) = 16.8
        assert got[0].hot_factor == 16.8
        assert all(r.n == 1 and r.hot_factor == 0.21 for r in got[1:])

    def test_uniform_keys_factor_one(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import key_skew_profile

        df = spark.createDataFrame([Row(k=f"k{i % 5}") for i in range(50)])
        got = key_skew_profile(df, "k", top=5).collect()
        assert all(r.hot_factor == 1.0 and r.frac == 0.2 for r in got)
        # deterministic tie order by key
        assert [r.key for r in got] == [f"k{i}" for i in range(5)]

    def test_topk_plan_no_global_sort(self, spark):
        from tests.test_plans import plan_of

        from reader_spark.ops.profile import key_skew_profile

        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        plan = plan_of(key_skew_profile(events, "user_id", top=10))
        assert "TakeOrderedAndProject" in plan
        assert "partial" in plan.lower()

    def test_validation(self, spark):
        import pytest as _pytest
        from pyspark.sql import Row

        from reader_spark.ops.profile import key_skew_profile

        df = spark.createDataFrame([Row(k=1)])
        with _pytest.raises(ValueError, match="top"):
            key_skew_profile(df, "k", top=0)


class TestEquiDepthHistogram:
    def test_uniform_data_equal_mass(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import equi_depth_histogram

        df = spark.createDataFrame([Row(v=float(x)) for x in range(100)])
        rows = {r.bin: r for r in equi_depth_histogram(df, "v", bins=4).collect()}
        assert set(rows) == {0, 1, 2, 3}
        assert sum(r.n for r in rows.values()) == 100
        # uniform data: every bin holds ~25 rows
        assert all(20 <= r.n <= 30 for r in rows.values())
        assert rows[0].lo == 0.0 and rows[3].hi == 99.0
        # edges chain: bin i's hi == bin i+1's lo
        for i in range(3):
            assert rows[i].hi == rows[i + 1].lo

    def test_skewed_data_adapts_unlike_equi_width(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.profile import (
            equi_depth_histogram,
            equi_width_histogram,
        )

        rows = [Row(v=float(i) / 100) for i in range(99)] + [Row(v=1000.0)]
        df = spark.createDataFrame(rows)
        depth = {r.bin: r.n for r in equi_depth_histogram(df, "v", bins=4).collect()}
        width = {r.bin: r.n for r in equi_width_histogram(df, "v", bins=4).collect()}
        # equi-width collapses 99% of the mass into one bin; equi-depth
        # keeps every bin near 25
        assert max(width.values()) == 99
        assert max(depth.values()) <= 30

    def test_approx_mode_close_and_no_sort(self, spark):
        from tests.test_plans import plan_of

        from reader_spark.ops.profile import equi_depth_histogram

        events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        exact = {r.bin: r.n for r in equi_depth_histogram(events, "value", bins=5).collect()}
        approx = {r.bin: r.n for r in equi_depth_histogram(
            events, "value", bins=5, exact=False).collect()}
        total = sum(exact.values())
        for b in exact:
            assert abs(approx.get(b, 0) - exact[b]) <= 0.05 * total
        plan = plan_of(equi_depth_histogram(events, "value", bins=5, exact=False))
        assert "Sort" not in plan.split("\n\n")[0]

    def test_validation(self, spark):
        from pyspark.sql import Row

        import pytest as _pytest

        from reader_spark.ops.profile import equi_depth_histogram

        df = spark.createDataFrame([Row(v=1.0)])
        with _pytest.raises(ValueError, match="bins"):
            equi_depth_histogram(df, "v", bins=0)
