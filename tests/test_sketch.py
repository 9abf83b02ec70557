"""Count-min sketch: one-sided guarantee, cell-table size bound,
mergeability (the property that makes it a 100 TB sketch), and real
overcounts when width < cardinality."""

import pytest
from pyspark.sql import functions as F

from reader_spark.ops.sketch import cms_build, cms_estimate

pytestmark = pytest.mark.spark

DEPTH, WIDTH = 4, 16


@pytest.fixture(scope="module")
def skewed_keys(spark):
    # 40 distinct keys, zipf-ish: key 0 dominates; width 16 forces collisions
    rows = [(k,) for k in range(40) for _ in range(1 + (200 if k == 0 else k % 7))]
    return spark.createDataFrame(rows, "k long")


@pytest.fixture(scope="module")
def truth(skewed_keys):
    return {r["k"]: r["n"] for r in
            skewed_keys.groupBy("k").agg(F.count("*").alias("n")).collect()}


@pytest.mark.parametrize("portable", [False, True])
def test_one_sided_guarantee(skewed_keys, truth, portable):
    sketch = cms_build(skewed_keys, "k", DEPTH, WIDTH, portable=portable)
    keys = skewed_keys.select("k").distinct()
    est = {r["k"]: r["est"] for r in
           cms_estimate(sketch, keys, "k", DEPTH, WIDTH, portable=portable).collect()}
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)       # never undercounts
    total = sum(truth.values())
    assert all(est[k] - truth[k] <= total for k in truth)
    assert any(est[k] > truth[k] for k in truth)        # collisions are real here


def test_sketch_size_bounded(skewed_keys):
    sketch = cms_build(skewed_keys, "k", DEPTH, WIDTH)
    assert sketch.count() <= DEPTH * WIDTH
    # total mass per row d equals the row count
    per_d = sketch.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
    n = skewed_keys.count()
    assert {r["d"]: r["s"] for r in per_d} == {d: n for d in range(DEPTH)}


def test_merge_equals_rebuild(spark, skewed_keys):
    """Sketch(A) + Sketch(B) cell-wise == Sketch(A union B) — the merge
    property that lets per-partition/per-day sketches combine."""
    a = skewed_keys.where(F.col("k") % 2 == 0)
    b = skewed_keys.where(F.col("k") % 2 == 1)
    merged = (
        cms_build(a, "k", DEPTH, WIDTH)
        .unionByName(cms_build(b, "k", DEPTH, WIDTH))
        .groupBy("d", "w")
        .agg(F.sum("cnt").alias("cnt"))
    )
    rebuilt = cms_build(skewed_keys, "k", DEPTH, WIDTH)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rebuilt.collect()))


def test_absent_key_estimates_noise_floor(spark, skewed_keys):
    sketch = cms_build(skewed_keys, "k", DEPTH, WIDTH)
    ghost = spark.createDataFrame([(99999,)], "k long")
    est = cms_estimate(sketch, ghost, "k", DEPTH, WIDTH).collect()[0]["est"]
    assert est >= 0  # may be > 0 (collision noise), never negative/null


def test_bad_args_rejected(skewed_keys):
    with pytest.raises(ValueError):
        cms_build(skewed_keys, "k", depth=0)
    with pytest.raises(ValueError):
        cms_build(skewed_keys, "k", width=1)


class TestCmsJoinSize:
    def test_one_sided_and_tightens_with_width(self, spark):
        from pyspark.sql import functions as F

        from reader_spark.ops.sketch import cms_build, cms_join_size

        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        a = events.where(F.col("event_type") == "view")
        b = events.where(F.col("event_type") == "purchase")
        truth = (
            a.groupBy("user_id").count().withColumnRenamed("count", "na")
            .join(b.groupBy("user_id").count().withColumnRenamed("count", "nb"), "user_id")
            .agg(F.sum(F.col("na") * F.col("nb"))).head()[0]
        )
        est_narrow = cms_join_size(
            cms_build(a, "user_id", depth=4, width=16),
            cms_build(b, "user_id", depth=4, width=16),
        ).head()["est_join_size"]
        est_wide = cms_join_size(
            cms_build(a, "user_id", depth=4, width=512),
            cms_build(b, "user_id", depth=4, width=512),
        ).head()["est_join_size"]
        assert est_narrow >= truth and est_wide >= truth  # one-sided
        assert est_wide - truth <= est_narrow - truth      # width tightens
        assert est_wide - truth <= truth  # 512 cells >> 150 keys: tight


class TestKmv:
    def test_estimate_within_bound_and_exact_below_k(self, spark):
        from pyspark.sql import Row, functions as F

        from reader_spark.ops.sketch import kmv_distinct

        rows = [Row(g="big", key=i) for i in range(2000)] + [
            Row(g="small", key=i) for i in range(10)
        ]
        df = spark.createDataFrame(rows)
        got = {r.g: r for r in kmv_distinct(df, "g", "key", k=64).collect()}
        assert got["small"].est_distinct == 10.0  # exact below k
        # KMV relative error ~ 1/sqrt(k-2) ~ 13%; allow 3 sigma
        assert abs(got["big"].est_distinct - 2000) / 2000 < 0.4

    def test_bottom_k_is_mergeable(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.sketch import kmv_bottom_k

        rows = [Row(g="x", key=i) for i in range(500)]
        df = spark.createDataFrame(rows)
        whole = [r.u for r in kmv_bottom_k(df, "g", "key", k=16).collect()]
        # merge = union the two halves' sketches, keep 16 smallest
        h1 = [r.u for r in kmv_bottom_k(df.where("key < 250"), "g", "key", k=16).collect()]
        h2 = [r.u for r in kmv_bottom_k(df.where("key >= 250"), "g", "key", k=16).collect()]
        merged = sorted(h1 + h2)[:16]
        assert sorted(whole) == merged


class TestKmvJaccard:
    def test_disjoint_identical_and_half(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.sketch import kmv_jaccard_pairs

        rows = (
            [Row(g="p", key=i) for i in range(200)]           # P = 0..199
            + [Row(g="q", key=i) for i in range(200)]         # Q identical
            + [Row(g="r", key=i) for i in range(100, 300)]    # R half-overlap
            + [Row(g="z", key=i) for i in range(1000, 1200)]  # Z disjoint
        )
        df = spark.createDataFrame(rows)
        got = {(r.group_a, r.group_b): r.jaccard_est
               for r in kmv_jaccard_pairs(df, "g", "key", k=64).collect()}
        assert got[("p", "q")] == 1.0
        assert got[("p", "z")] == 0.0
        # true J(P,R) = 100/300 = 0.333; k=64 estimator sigma ~ sqrt(J(1-J)/k) ~ 0.06
        assert abs(got[("p", "r")] - 1 / 3) < 0.2
