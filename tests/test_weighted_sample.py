"""Efraimidis-Spirakis weighted sampling: proportionality across many
independent strata, exact k without replacement, zero-weight exclusion,
determinism, and the monotone-eviction property (growing the corpus never
un-picks a row that still beats the competition)."""

import pytest
from pyspark.sql import functions as F

from reader_spark.ops.sampling import weighted_sample_topk

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def trials(spark):
    # 200 strata; each has one heavy key (w=10) and ten light keys (w=1)
    rows = []
    for s in range(200):
        rows.append((s, f"s{s}-heavy", 10.0))
        rows.extend((s, f"s{s}-light{i}", 1.0) for i in range(10))
    return spark.createDataFrame(rows, "stratum long, key string, w double")


def winners(df, k=1, portable=False):
    out = weighted_sample_topk(
        df, F.col("key"), F.col("w"), k, ["stratum"], portable=portable
    )
    return {(r["stratum"], r["key"]) for r in out.collect()}


@pytest.mark.parametrize("portable", [False, True])
def test_inclusion_tracks_weight(trials, portable):
    """P(heavy wins k=1) = 10/20 = 0.5 vs 0.05 per light key; across 200
    independent strata the heavy key must dominate."""
    won = winners(trials, k=1, portable=portable)
    heavy_wins = sum(1 for _, key in won if key.endswith("heavy"))
    assert len(won) == 200           # exactly one winner per stratum
    assert 60 <= heavy_wins <= 140   # ~100 expected; 6-sigma-ish bounds


def test_exactly_k_without_replacement(trials):
    out = weighted_sample_topk(trials, F.col("key"), F.col("w"), 3, ["stratum"])
    per = out.groupBy("stratum").count().collect()
    assert all(r["count"] == 3 for r in per)
    assert out.select("key").distinct().count() == out.count()


def test_zero_and_negative_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.0), (1, "b", -3.0), (1, "c", 2.0)],
        "stratum long, key string, w double",
    )
    got = winners(df, k=5)
    assert got == {(1, "c")}


def test_deterministic_and_monotone_under_growth(trials):
    first = winners(trials, k=2)
    assert winners(trials, k=2) == first  # re-run identical
    # drop half the light keys: every surviving winner from the full draw
    # must still win in the smaller corpus (ranks are per-row constants)
    smaller = trials.where(~F.col("key").rlike("light[5-9]$"))
    kept = {(s, k) for (s, k) in first if "light5" not in k and not any(
        k.endswith(f"light{i}") for i in range(5, 10))}
    assert kept <= winners(smaller, k=2)


def test_bad_k_rejected(trials):
    with pytest.raises(ValueError):
        weighted_sample_topk(trials, F.col("key"), F.col("w"), 0, ["stratum"])
