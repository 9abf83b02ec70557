"""HyperLogLog: estimate accuracy in the standard-error envelope, exact
small-range (linear counting) behavior, register merge == rebuild, and
register-value invariants."""

import pytest
from pyspark.sql import functions as F

from reader_spark.ops.hll import hll_estimate, hll_registers

pytestmark = pytest.mark.spark

B = 6  # m = 64, standard error ~1.04/8 = 13%


@pytest.fixture(scope="module")
def many_keys(spark):
    # 3000 distinct keys in one group, with duplicates (HLL ignores them)
    return spark.createDataFrame(
        [("g", i % 3000) for i in range(9000)], "grp string, k long"
    )


def est_of(df, group="grp"):
    regs = hll_registers(df, "k", [group], b=B)
    return {r[group]: r["hll_est"] for r in hll_estimate(regs, [group], b=B).collect()}


def test_estimate_within_error_envelope(many_keys):
    est = est_of(many_keys)["g"]
    assert abs(est - 3000) / 3000 < 0.40  # 3 sigma of the 13% std error


def test_duplicates_do_not_inflate(many_keys, spark):
    once = spark.createDataFrame([("g", i) for i in range(3000)], "grp string, k long")
    assert est_of(many_keys)["g"] == est_of(once)["g"]


def test_small_range_linear_counting_near_exact(spark):
    tiny = spark.createDataFrame([("g", i) for i in range(5)], "grp string, k long")
    est = est_of(tiny)["g"]
    assert abs(est - 5) < 1.0  # linear counting is near-exact at n << m


def test_register_merge_equals_rebuild(spark, many_keys):
    a = many_keys.where(F.col("k") % 2 == 0)
    b_ = many_keys.where(F.col("k") % 2 == 1)
    merged = (
        hll_registers(a, "k", ["grp"], b=B)
        .unionByName(hll_registers(b_, "k", ["grp"], b=B))
        .groupBy("grp", "bucket")
        .agg(F.max("register").alias("register"))
    )
    rebuilt = hll_registers(many_keys, "k", ["grp"], b=B)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rebuilt.collect()))
    # and the merged registers give the identical estimate
    e1 = hll_estimate(merged, ["grp"], b=B).collect()[0]["hll_est"]
    e2 = hll_estimate(rebuilt, ["grp"], b=B).collect()[0]["hll_est"]
    assert e1 == e2


def test_register_invariants(many_keys):
    regs = hll_registers(many_keys, "k", ["grp"], b=B)
    assert regs.count() <= 64
    bad = regs.where(
        (F.col("bucket") < 0) | (F.col("bucket") >= 64)
        | (F.col("register") < 1) | (F.col("register") > 27)
    ).count()
    assert bad == 0


def test_bad_b_rejected(many_keys):
    with pytest.raises(ValueError):
        hll_registers(many_keys, "k", ["grp"], b=3)
    with pytest.raises(ValueError):
        hll_registers(many_keys, "k", ["grp"], b=17)


class TestHLLMerge:
    def test_merged_registers_equal_direct(self, spark):
        """Sketch per split, merge by bucket-max -> identical registers to
        sketching the union directly (lossless union, the distributed
        guarantee)."""
        from pyspark.sql import functions as F

        from reader_spark.ops.hll import hll_estimate, hll_merge, hll_registers

        df = spark.range(0, 5000).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("part"),
        )
        merged = hll_merge(hll_registers(df, "k", ["part"], b=6), [])
        direct = hll_registers(df, "k", [], b=6)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )
        m_est = hll_estimate(merged, [], b=6).head()["hll_est"]
        d_est = hll_estimate(direct, [], b=6).head()["hll_est"]
        assert m_est == d_est

    def test_merge_to_intermediate_grouping(self, spark):
        """Merging (a, b)-grouped sketches down to (a) equals sketching at
        (a) directly."""
        from pyspark.sql import functions as F

        from reader_spark.ops.hll import hll_merge, hll_registers

        df = spark.range(0, 2000).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).alias("a"),
            (F.col("id") % 5).alias("b"),
        )
        fine = hll_registers(df, "k", ["a", "b"], b=5)
        merged = hll_merge(fine, ["a"])
        direct = hll_registers(df, "k", ["a"], b=5)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )
