"""Stride mix schedule (ops/interleave.py) and k-anonymity audit
(ops/privacy.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reader_spark.ops.interleave import mix_schedule
from reader_spark.ops.privacy import k_anonymity_audit, k_anonymity_summary

pytestmark = pytest.mark.spark


def _weights(spark, w):
    return spark.createDataFrame(
        [Row(domain=d, weight_milli=v) for d, v in w.items()]
    )


def test_schedule_counts_match_entitlement(spark):
    w = {"a": 500, "b": 300, "c": 200}
    sched = mix_schedule(_weights(spark, w), n_steps=100).collect()
    assert len(sched) == 100
    counts = {}
    for r in sched:
        counts[r["domain"]] = counts.get(r["domain"], 0) + 1
    assert counts == {"a": 50, "b": 30, "c": 20}


def test_stride_lag_bound_every_prefix(spark):
    """Stride scheduling's lag guarantee: through ANY prefix, each
    domain's count stays within a small constant (< 2 batches) of its
    proportional entitlement — the pairwise-fairness bound Waldspurger
    proves implies this absolute bound up to one extra batch."""
    w = {"a": 700, "b": 200, "c": 100}
    tot = sum(w.values())
    sched = sorted(
        mix_schedule(_weights(spark, w), n_steps=200).collect(),
        key=lambda r: r["step"],
    )
    counts = dict.fromkeys(w, 0)
    for i, r in enumerate(sched, start=1):
        counts[r["domain"]] += 1
        for d in w:
            assert abs(counts[d] - i * w[d] / tot) < 2.0, (i, d, counts)


def test_schedule_k_is_dense_per_domain(spark):
    sched = mix_schedule(_weights(spark, {"a": 600, "b": 400}), 50).collect()
    per = {}
    for r in sorted(sched, key=lambda r: r["step"]):
        per.setdefault(r["domain"], []).append(r["k"])
    for ks in per.values():
        assert ks == list(range(len(ks)))


def test_schedule_zero_weight_excluded_and_validation(spark):
    sched = mix_schedule(
        _weights(spark, {"a": 1000, "z": 0}), n_steps=10
    ).collect()
    assert {r["domain"] for r in sched} == {"a"}
    with pytest.raises(ValueError):
        mix_schedule(_weights(spark, {"a": 1}), n_steps=0)


@pytest.fixture(scope="module")
def people(spark):
    rows = [Row(pid=i, city="nyc", age_band="30s") for i in range(10)]
    rows += [Row(pid=100, city="nyc", age_band="90s")]  # isolated combo
    rows += [Row(pid=200 + i, city="sf", age_band="30s") for i in range(3)]
    return spark.createDataFrame(rows)


def test_k_anonymity_audit_flags_small_groups(people):
    got = {
        (r["city"], r["age_band"]): (r["n_rows"], r["violates"])
        for r in k_anonymity_audit(people, ["city", "age_band"], k=5).collect()
    }
    assert got[("nyc", "30s")] == (10, False)
    assert got[("nyc", "90s")] == (1, True)
    assert got[("sf", "30s")] == (3, True)


def test_k_anonymity_summary(people):
    row = k_anonymity_summary(people, ["city", "age_band"], k=5).collect()[0]
    assert row["n_groups"] == 3
    assert row["n_violating_groups"] == 2
    assert row["n_rows_at_risk"] == 4
    assert row["min_group_size"] == 1


def test_k_anonymity_validation(people):
    with pytest.raises(ValueError):
        k_anonymity_audit(people, [], k=5)
    with pytest.raises(ValueError):
        k_anonymity_audit(people, ["city"], k=1)


def test_schedule_plan_no_single_partition_window(spark):
    from tests.test_plans import plan_of

    plan = plan_of(mix_schedule(_weights(spark, {"a": 600, "b": 400}), 50))
    # scalable_rank's window partitions by range bucket; the only
    # SinglePartition exchanges allowed are 1-row scalar aggregates.
    assert "Window" in plan
    for block in plan.split("\n\n"):
        if "SinglePartition" in block:
            assert "Input [1]:" in block, block
        if block.lstrip().startswith("(") and ") Window" in block.split("\n")[0]:
            assert "partitionBy" not in block or "__rb" in block
