"""Poisson bootstrap (ops/bootstrap.py): weight distribution sanity,
CI coverage behavior, determinism, and plan shape."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.bootstrap import bootstrap_mean_ci, poisson_weight

pytestmark = pytest.mark.spark


def test_weight_distribution_close_to_poisson1(spark):
    df = spark.range(4000).select(
        poisson_weight(F.col("id"), F.lit(0)).alias("w")
    )
    dist = {r["w"]: r["count"] for r in df.groupBy("w").count().collect()}
    n = sum(dist.values())
    # P(0) = P(1) = 1/e ~ 0.368; P(2) ~ 0.184.
    assert abs(dist[0] / n - 0.368) < 0.03
    assert abs(dist[1] / n - 0.368) < 0.03
    assert abs(dist.get(2, 0) / n - 0.184) < 0.03
    mean_w = sum(k * v for k, v in dist.items()) / n
    assert abs(mean_w - 1.0) < 0.05


def test_ci_brackets_point_estimate_and_tightens(spark):
    rows = [
        Row(doc_id=i, source="s0", val=100 + (i * 13) % 50) for i in range(400)
    ] + [
        Row(doc_id=1000 + i, source="s1", val=100 + (i * 13) % 50)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["source"]: r
        for r in bootstrap_mean_ci(
            df, value_col="val", group_col="source", key_col="doc_id"
        ).collect()
    }
    for s in ("s0", "s1"):
        r = out[s]
        assert r["lo_milli"] <= r["mean_milli"] <= r["hi_milli"]
        assert r["n_replicates"] == 32
    # 20x more rows -> materially tighter interval.
    wide = out["s1"]["hi_milli"] - out["s1"]["lo_milli"]
    tight = out["s0"]["hi_milli"] - out["s0"]["lo_milli"]
    assert tight * 2 < wide


def test_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", val=i % 7) for i in range(50)]
    )
    a = bootstrap_mean_ci(df, "val", "source", "doc_id").collect()
    b = bootstrap_mean_ci(df, "val", "source", "doc_id").collect()
    assert a == b


def test_param_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, source="s", val=1)])
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "val", "source", "doc_id", replicates=1)
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "val", "source", "doc_id", alpha_milli=900)


def test_plan_partial_agg_before_shuffle(spark):
    from tests.test_plans import plan_of

    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", val=1) for i in range(10)]
    )
    plan = plan_of(bootstrap_mean_ci(df, "val", "source", "doc_id"))
    tree = plan.split("\n\n")[0]
    # the replicate-means aggregate must partial-aggregate map-side.
    assert tree.index("HashAggregate") < tree.index("Exchange")
