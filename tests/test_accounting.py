"""Training-budget accounting: epoch_schedule integer math across all
three repetition regimes, and vocab_coverage's log2-bucket cumulative
curve against a hand computation."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.allocate import epoch_schedule
from reader_spark.ops.vocab import vocab_coverage

pytestmark = pytest.mark.spark


def test_epoch_schedule_three_regimes(spark):
    domains = spark.createDataFrame(
        [
            # weights sum 10 -> targets are weight * 1000
            Row(domain="big", available_tokens=100_000, weight=1),
            Row(domain="repeat", available_tokens=500, weight=1),
            Row(domain="overcap", available_tokens=100, weight=8),
        ]
    )
    got = {r["domain"]: r for r in
           epoch_schedule(domains, budget_tokens=10_000).collect()}
    big = got["big"]  # target 1000 of 100k available: 1% of an epoch
    assert big["target_tokens"] == 1000
    assert big["epochs_milli"] == 10
    assert big["unique_tokens"] == 1000
    assert big["repeated_tokens"] == 0
    assert big["excess_tokens"] == 0 and not big["over_cap"]
    rep = got["repeat"]  # target 1000 of 500: 2 epochs, under cap
    assert rep["epochs_milli"] == 2000
    assert rep["unique_tokens"] == 500
    assert rep["repeated_tokens"] == 500
    assert rep["excess_tokens"] == 0 and not rep["over_cap"]
    over = got["overcap"]  # target 8000 of 100: 80 epochs, cap = 400
    assert over["epochs_milli"] == 80_000
    assert over["repeated_tokens"] == 7900
    assert over["excess_tokens"] == 8000 - 400
    assert over["over_cap"]


def test_epoch_schedule_rejects_bad_budget(spark):
    d = spark.createDataFrame(
        [Row(domain="a", available_tokens=10, weight=1)]
    )
    with pytest.raises(ValueError):
        epoch_schedule(d, budget_tokens=0)
    with pytest.raises(ValueError):
        epoch_schedule(d, budget_tokens=10, max_epochs_milli=0)


def test_vocab_coverage_hand_checked(spark):
    # freqs: a=5, b=3, c=2, d=1, e=1  (total 12)
    # ranks: a=1 (j0), b=2 (j1), c=3..d=4 (j2), e=5 (j3)
    docs = spark.createDataFrame(
        [Row(text="a a a a a b b b c c d e")]
    )
    got = {r["k_cut"]: r for r in vocab_coverage(docs).collect()}
    assert set(got) == {1, 2, 4, 8}
    assert got[1]["n_types"] == 1
    assert got[1]["covered_occurrences"] == 5
    assert got[1]["coverage_milli"] == 5000 // 12
    assert got[2]["covered_occurrences"] == 8
    assert got[4]["n_types"] == 4
    assert got[4]["covered_occurrences"] == 11
    assert got[8]["n_types"] == 5
    assert got[8]["coverage_milli"] == 1000


def test_vocab_coverage_empty_tokens_dropped(spark):
    docs = spark.createDataFrame([Row(text="x  x")])  # double space
    got = vocab_coverage(docs).collect()
    assert len(got) == 1
    assert got[0]["k_cut"] == 1 and got[0]["covered_occurrences"] == 2
